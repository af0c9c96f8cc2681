"""Sharding rules: parameter, decode-state, and batch PartitionSpecs.

Megatron-style tensor parallelism for the Phi-3 decoder, expressed as
logical ``PartitionSpec``s and compiled through GSPMD (the TPU-native
"NCCL": XLA inserts psum/all-gather/reduce-scatter over ICI):

* fused qkv / gate_up projections: output dim sharded on ``model``;
* o_proj / down_proj: input dim sharded on ``model`` (their matmul produces
  partial sums -> XLA emits the all-reduce);
* embed / lm_head: vocab dim sharded on ``model``;
* KV cache: heads sharded on ``model``, batch on ``data``;
* LoRA: A replicated (rank is tiny), B output-sharded to match its base;
* vision tower + norms: replicated (small).

Single-chip meshes make every spec a no-op, so sharded execution reproduces
stages 2-7 of the build exactly (SURVEY.md §7 stage 8 gate).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ModelConfig
from ..engine.state import DecodeState, KVCache


def _spec_for_param(path: str, ndim: int) -> P:
    """PartitionSpec for a parameter leaf addressed by its dotted path."""
    def last(*axes):
        """Pad with leading Nones to ndim."""
        return P(*([None] * (ndim - len(axes)) + list(axes)))

    if "vision_embed_tokens" in path:
        return P()  # replicate the vision tower (≈0.4B, fine everywhere)
    if "lora_a" in path or "lora_scale" in path:
        return P()
    if "lora_b" in path:
        if "o_proj" in path or "down_proj" in path:
            return P()  # base output is replicated after all-reduce
        return last("model")
    if "embed_tokens" in path:
        # (V, E) — vocab-shard the table and its quant scales/biases alike.
        return P("model", None) if ndim == 2 else P()
    if "lm_head" in path:
        return last("model")  # (E, V) / scales (E//g, V)
    if "qkv_proj" in path or "gate_up_proj" in path:
        return last("model")  # (nl, K, N): shard N
    if "o_proj" in path or "down_proj" in path:
        # (nl, K, N): shard K (contraction) -> partial sums all-reduced.
        if path.endswith(("scales", "biases")):
            return last("model", None)  # (nl, K//g, N)
        return last("model", None)
    return P()  # norms, biases, misc: replicated


def param_shardings(params: dict, mesh: Mesh) -> dict:
    """Pytree of NamedSharding matching ``params``."""
    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k) for k, v in node.items()}
        return NamedSharding(mesh, _spec_for_param(path, getattr(node, "ndim", 0)))

    return walk(params, "")


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place parameters onto the mesh according to the rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def state_shardings(cfg: ModelConfig, mesh: Mesh, quantized_cache: bool = None):
    """NamedShardings for a DecodeState: cache heads on model, batch on data.

    Pytree structure must match the real ``KVCache`` exactly: the quantized
    cache fuses k+v payload into ``k`` (nl, B, KV, 2D, L) and all four
    scale/bias planes into ``k_scales`` (nl, B, KV, 4G, L), leaving the other
    four fields None (engine/state.py ``init_state``).  Either layout keeps
    layer first, batch second, kv-heads third — so one spec serves both.
    """
    quantized_cache = (
        cfg.use_quantized_cache if quantized_cache is None else quantized_cache
    )
    kv_spec = NamedSharding(mesh, P(None, "data", "model", None, None))
    if quantized_cache:
        kv = KVCache(k=kv_spec, v=None, k_scales=kv_spec)
    else:
        kv = KVCache(k=kv_spec, v=kv_spec)
    return DecodeState(
        kv=kv,
        offset=NamedSharding(mesh, P()),
        valid=NamedSharding(mesh, P("data", None)),
        cos=NamedSharding(mesh, P(None, None, None)),
        sin=NamedSharding(mesh, P(None, None, None)),
    )


def batch_spec(mesh: Mesh) -> NamedSharding:
    from .mesh import batch_axes

    return NamedSharding(mesh, P(batch_axes(mesh)))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Shard host batch arrays along their leading (batch) axis — over
    (dcn, data) jointly on multi-host meshes, data alone otherwise."""
    from .mesh import batch_axes

    axes = batch_axes(mesh)

    def put(x):
        spec = P(*([axes] + [None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(jax.numpy.asarray(v)) for k, v in batch.items()}
