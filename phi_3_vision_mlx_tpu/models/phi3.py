"""Phi-3 decoder — functional TPU-native implementation.

Capability parity with the reference model stack
(/root/reference/phi.py:418-617): fused qkv projection, su-scaled RoPE,
GQA-capable attention against a preallocated KV window, SwiGLU MLP with fused
gate_up projection, pre-RMSNorm residual blocks, untied lm_head, left-padded
batch semantics (pids/mask), beam cache-repeat and offset-rewind scoring for
constrained decoding.

Architecture differences (deliberate, TPU-first):

* parameters are a pytree with the per-layer subtree *stacked* along a
  leading layer axis so the decoder runs as one ``lax.scan`` — one compiled
  layer body instead of 32 unrolled blocks;
* all mutable state (cache, offset, masks, rope tables) lives in an explicit
  :class:`~..engine.state.DecodeState` threaded through pure step functions;
* masks are computed on the fly from (offset, validity bits, causal rule) —
  no materialized L x L ``Mask4D``;
* softmax/norm accumulate in fp32; weights/activations default to bfloat16.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import ModelConfig
from ..engine.state import (
    DecodeState,
    KVCache,
    LayerKV,
    index_layer,
    init_state,
    quantize_chunk,
    read_kv,
    update_layer_chunk,
)
from ..ops.attention import masked_attention
from ..ops.linear import dense, dense_stacked, embedding
from ..ops.norms import rms_norm
from ..ops.rope import apply_rotary, su_rope_tables


# Linear leaves large enough to matter in the decode loop.  Their stacked
# quantized payloads are kept OUT of the layer scan (no per-layer slicing;
# the Pallas kernel indexes the layer in HBM, ops/linear.py:dense_stacked).
_HEAVY_KEYS = (
    ("self_attn", "qkv_proj"),
    ("self_attn", "o_proj"),
    ("mlp", "gate_up_proj"),
    ("mlp", "down_proj"),
)


def _partition_heavy(layers: dict):
    """Split the stacked layer tree into (scan-xs tree, heavy dict).

    Only kernel-layout quantized bases move to ``heavy`` (payload dtype
    int8/uint8-packed); everything else — norms, LoRA leaves, fp weights,
    fallback-layout payloads — stays in the scan xs unchanged."""
    light = {k: (dict(v) if isinstance(v, dict) else v) for k, v in layers.items()}
    heavy = {}
    for path in _HEAVY_KEYS:
        parent = light
        for part in path[:-1]:
            node = dict(parent[part]) if isinstance(parent[part], dict) else parent[part]
            parent[part] = node
            parent = node
        leaf = parent.get(path[-1])
        if not isinstance(leaf, dict) or "scales" not in leaf:
            continue
        q = leaf.get("weight")
        tiled = getattr(q, "ndim", 0) == 5  # (nl, nk, nn, bk, bn//2)
        packed = (
            getattr(q, "dtype", None) == jnp.uint8
            and q.shape[-1] * 2 == leaf["scales"].shape[-1]
        )
        if not (tiled or packed):
            continue
        heavy[path] = {
            k: leaf[k] for k in ("weight", "scales", "biases") if k in leaf
        }
        parent[path[-1]] = {
            k: v for k, v in leaf.items() if k not in ("weight", "scales", "biases")
        }
    return light, heavy


# Stable per-path ids for dropout rng folding (order is arbitrary but fixed).
_PATH_IDS = {
    ("self_attn", "qkv_proj"): 0,
    ("self_attn", "o_proj"): 1,
    ("mlp", "gate_up_proj"): 2,
    ("mlp", "down_proj"): 3,
}


def _dense_at(lp, heavy, path, x, layer_idx, dropout=None):
    """Apply the linear at ``path``: stacked kernel when heavy, else dense.

    ``dropout``: optional ``(rng, rate)`` — LoRA-branch dropout (reference
    LoRALinear applies dropout to the adapter input, phi.py:87,129-133);
    training-only, keyed per (layer, path) so the scan body stays pure.
    """
    node = lp
    for part in path:
        node = node[part]
    mask = None
    if dropout is not None and isinstance(node, dict) and "lora_a" in node:
        key, rate = dropout
        key = jax.random.fold_in(
            jax.random.fold_in(key, layer_idx), _PATH_IDS.get(path, 7)
        )
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, x.shape).astype(x.dtype) / keep
    hv = heavy.get(path)
    if hv is not None:
        return dense_stacked(hv, node, x, layer_idx, dropout_mask=mask)
    return dense(node, x, dropout_mask=mask)


def _use_flash(lq: int, lk: int) -> bool:
    """Route big attention shapes to the Pallas flash kernel (TPU only).

    The XLA path materializes (B, H, Lq, Lk) score tensors — fine for decode
    steps, quadratic-memory for long prefill (the reference's scaling cliff,
    SURVEY.md §5).  Threshold keeps small/medium shapes on XLA where fusion
    wins.  Env: PHI3V_TPU_FLASH=0 disables, =1 forces (when on TPU).
    """
    import os

    flag = os.environ.get("PHI3V_TPU_FLASH", "auto")
    if flag == "0":
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return False
    if flag == "1":
        return True
    # r3 on-chip sweeps (full-model prefill, fraction).  With the larger
    # (1024, 2048) flash tiles: lk=576 flash LOSES 18%, lk=832 wins 3%,
    # lk=1088 wins 10%, lk=1958 wins 21% vs the XLA path -> flash from
    # ~768 keys up.  (Old (256, 512) tiles needed lk >= 1024.)
    return lq >= 512 and lk >= 768


def _use_kv_kernel(lq: int) -> bool:
    """Quantized-cache decode kernel: TPU, small query chunks only."""
    import os

    if os.environ.get("PHI3V_TPU_KV_KERNEL", "1") == "0":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return lq <= 16


def _use_qflash(lq: int) -> bool:
    """Quantized-cache FLASH kernel (mid-size chunks): reads the packed cache
    in place instead of read_kv-materializing the window per chunk per layer.

    Measured on the v5e fraction (32K window, r3): big chunks (lq=8192)
    amortize the one-off window dequant over many queries and the bf16 flash
    path wins (2633 vs 1335 tok/s) — the qflash kernel re-dequantizes every
    kv tile once per q-tile.  Mid-size scoring chunks (256..2048) amortize
    poorly; qflash avoids the window-sized HBM copy there.
    Env: PHI3V_TPU_QFLASH=0 disables, =1 forces (on TPU)."""
    import os

    flag = os.environ.get("PHI3V_TPU_QFLASH", "auto")
    if flag == "0":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    if flag == "1":
        return True
    return 256 <= lq <= 2048


class ForwardResult(NamedTuple):
    logits: jax.Array
    state: Optional[DecodeState]


# ---------------------------------------------------------------------------
# Parameter initialization (random; real weights come from core/weights.py)
# ---------------------------------------------------------------------------


def init_params(cfg: ModelConfig, key, dtype=None) -> dict:
    """Random parameters with the exact pytree structure of a loaded
    checkpoint (layer subtree stacked along axis 0)."""
    dtype = dtype or jnp.dtype(cfg.dtype)
    e, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    h, kv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    nl = cfg.num_hidden_layers
    op = (h + 2 * kv) * d
    ks = jax.random.split(key, 8)

    def nrm(k, shape, scale=None):
        scale = scale if scale is not None else (shape[-2] if len(shape) > 1 else e) ** -0.5
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params = {
        "model": {
            "embed_tokens": {"weight": nrm(ks[0], (v, e), 0.02)},
            "layers": {
                "self_attn": {
                    "qkv_proj": {"weight": nrm(ks[1], (nl, e, op))},
                    "o_proj": {"weight": nrm(ks[2], (nl, h * d, e))},
                },
                "mlp": {
                    "gate_up_proj": {"weight": nrm(ks[3], (nl, e, 2 * i))},
                    "down_proj": {"weight": nrm(ks[4], (nl, i, e))},
                },
                "input_layernorm": {"weight": jnp.ones((nl, e), dtype)},
                "post_attention_layernorm": {"weight": jnp.ones((nl, e), dtype)},
            },
            "norm": {"weight": jnp.ones((e,), dtype)},
        },
        "lm_head": {"weight": nrm(ks[5], (e, v))},
    }
    if cfg.has_vision:
        from .vision import init_vision_params

        params["model"]["vision_embed_tokens"] = init_vision_params(cfg, ks[6], dtype)
    return params


# ---------------------------------------------------------------------------
# Decoder layer (scanned)
# ---------------------------------------------------------------------------


def _qkv_split(cfg: ModelConfig, qkv):
    """Fused qkv -> (B,H,L,D),(B,KV,L,D),(B,KV,L,D) (reference phi.py:443-446)."""
    b, l, _ = qkv.shape
    h, kv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = qkv[..., : h * d].reshape(b, l, h, d).transpose(0, 2, 1, 3)
    k = qkv[..., h * d : (h + kv) * d].reshape(b, l, kv, d).transpose(0, 2, 1, 3)
    v = qkv[..., (h + kv) * d :].reshape(b, l, kv, d).transpose(0, 2, 1, 3)
    return q, k, v


def _layer_step(
    cfg: ModelConfig, x, lp, kv_full, layer_idx, cos, sin, allowed, offset,
    n_beam, write, valid=None, heavy=None, dropout=None,
):
    """One decoder block: pre-norm attn + pre-norm SwiGLU MLP with residuals
    (reference Phi3DecoderLayer, phi.py:473-485).

    The cache is the full stacked (num_layers, ...) buffer carried through
    the layer scan; this step writes only the fresh chunk's columns of its
    layer (O(tokens), not O(window)) and reads its layer slice for attention.
    """
    scale = cfg.head_dim**-0.5
    h = rms_norm(x, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
    qkv = _dense_at(lp, heavy, ("self_attn", "qkv_proj"), h, layer_idx, dropout=dropout)
    q, k, v = _qkv_split(cfg, qkv)
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)

    if write:
        entries = quantize_chunk(k, v, cfg.kv_quant, kv_full.quantized)
        kv_full = update_layer_chunk(kv_full, layer_idx, offset, entries)
        if kv_full.quantized and valid is not None and _use_kv_kernel(q.shape[2]):
            # Decode over the quantized cache without materializing a
            # dequantized copy (ops/kernels/kv_attention.py) — reads the
            # stacked transposed cache in place.
            from ..ops.kernels.kv_attention import (
                d_perm,
                d_unperm,
                quantized_kv_attention,
            )

            groups = kv_full.k_scales.shape[-2] // 4
            perm = d_perm(q.shape[-1], groups)
            o_p = quantized_kv_attention(
                q[..., perm], kv_full.k, kv_full.k_scales,
                valid, offset, layer_idx, scale=scale,
            )
            o = o_p[..., d_unperm(q.shape[-1], groups)].astype(x.dtype)
        elif (
            kv_full.quantized
            and valid is not None
            and cfg.kv_quant.bits == 4
            and _use_qflash(q.shape[2])
        ):
            # Prefill-sized chunks against the packed cache: flash tiling
            # with in-kernel nibble dequant (no window-sized dequantized
            # copy per chunk per layer).
            from ..ops.kernels.kv_attention import (
                d_perm,
                d_unperm,
                quantized_flash_attention,
            )

            groups = kv_full.k_scales.shape[-2] // 4
            perm = d_perm(q.shape[-1], groups)
            o_p = quantized_flash_attention(
                q[..., perm], kv_full.k, kv_full.k_scales, valid, offset,
                layer_idx, scale=scale,
            )
            o = o_p[..., d_unperm(q.shape[-1], groups)].astype(x.dtype)
        elif (
            not kv_full.quantized
            and valid is not None
            and _use_kv_kernel(q.shape[2])
            and kv_full.k.shape[3] >= 2048  # long windows: slice copies hurt
        ):
            # Dense decode: read the stacked cache in place — no per-layer
            # slice copies (ops/kernels/kv_attention.py:dense_kv_attention).
            from ..ops.kernels.kv_attention import dense_kv_attention

            o = dense_kv_attention(
                q, kv_full.k, kv_full.v, valid, offset, layer_idx, scale=scale
            ).astype(x.dtype)
        else:
            kc, vc = read_kv(index_layer(kv_full, layer_idx), x.dtype, cfg.kv_quant.bits)
            if valid is not None and _use_flash(q.shape[2], kc.shape[2]):
                from ..ops.kernels.flash_attention import flash_attention

                o = flash_attention(q, kc, vc, valid, offset, scale=scale)
            else:
                o = masked_attention(q, kc, vc, allowed, scale)
    else:
        # Beam / no-commit read path: repeat the shared cache n_beam x along
        # batch and append the fresh chunk (reference KVCache beam mode,
        # phi.py:523-527) — a pure read, the cache is untouched.
        kc, vc = read_kv(index_layer(kv_full, layer_idx), x.dtype, cfg.kv_quant.bits)
        if n_beam > 1:
            kc = jnp.repeat(kc, n_beam, axis=0)
            vc = jnp.repeat(vc, n_beam, axis=0)
        kc = jnp.concatenate([kc, k], axis=2)
        vc = jnp.concatenate([vc, v], axis=2)
        o = masked_attention(q, kc, vc, allowed, scale)

    b, _, l, _ = q.shape
    o = o.transpose(0, 2, 1, 3).reshape(b, l, -1)
    x = x + _dense_at(
        lp, heavy, ("self_attn", "o_proj"), o, layer_idx, dropout=dropout
    ).astype(x.dtype)

    h = rms_norm(x, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    gate_up = _dense_at(lp, heavy, ("mlp", "gate_up_proj"), h, layer_idx, dropout=dropout)
    gate, up = jnp.split(gate_up, 2, axis=-1)
    mlp = _dense_at(
        lp, heavy, ("mlp", "down_proj"),
        jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up, layer_idx,
        dropout=dropout,
    )
    x = x + mlp.astype(x.dtype)
    return x, kv_full


def _run_layers(
    cfg, layer_params, x, kv: KVCache, cos, sin, allowed, offset, n_beam, write,
    valid=None, dropout=None,
):
    nl = cfg.num_hidden_layers
    light, heavy = _partition_heavy(layer_params)

    def body(carry, xs):
        y, kv = carry
        lp, i = xs
        y, kv = _layer_step(
            cfg, y, lp, kv, i, cos, sin, allowed, offset, n_beam, write,
            valid=valid, heavy=heavy, dropout=dropout,
        )
        return (y, kv), None

    (x, kv), _ = lax.scan(body, (x, kv), (light, jnp.arange(nl)))
    return x, kv


# ---------------------------------------------------------------------------
# Full forward passes
# ---------------------------------------------------------------------------


def decode_forward(
    params: dict,
    cfg: ModelConfig,
    state: DecodeState,
    input_ids=None,
    inputs_embeds=None,
    *,
    advance: Optional[int] = None,
    n_beam: int = 1,
    last_logit_only: bool = False,
) -> ForwardResult:
    """Run a chunk through the decoder against an existing cache window.

    ``advance`` mirrors the reference's ``advance_offset`` (phi.py:589-591):
    None commits the whole chunk; an int commits exactly that many positions
    (0 = pure scoring / cache rewind, 1 = constrained-decoding step).
    ``n_beam > 1`` scores a (B*n_beam, L) chunk against the shared cache
    without committing anything.

    ``last_logit_only`` computes the lm_head for the final position only —
    prefill / chunked-prefill callers that consume ``logits[:, -1]`` skip a
    (L, E) x (E, V) matmul (~0.4 TFLOP per 2K-token chunk at full size).
    """
    mdl = params["model"]
    if inputs_embeds is None:
        inputs_embeds = embedding(mdl["embed_tokens"], input_ids)
    x = inputs_embeds.astype(jnp.dtype(cfg.dtype))
    b, l, _ = x.shape
    offset = state.offset
    lmax = state.window

    q_pos = offset + jnp.arange(l)
    cos = lax.dynamic_slice_in_dim(state.cos, offset, l, axis=1)
    sin = lax.dynamic_slice_in_dim(state.sin, offset, l, axis=1)
    # Align rope tables to the query batch: the cache batch may be 1 (shared
    # tables) or b//n_beam (beam rows repeat the cache batch, reference
    # phi.py:447-450).
    if cos.shape[0] == 1 and b > 1:
        cos = jnp.broadcast_to(cos, (b,) + cos.shape[1:])
        sin = jnp.broadcast_to(sin, (b,) + sin.shape[1:])
    elif cos.shape[0] != b:
        rep = b // cos.shape[0]
        cos = jnp.repeat(cos, rep, axis=0)
        sin = jnp.repeat(sin, rep, axis=0)

    write = n_beam == 1
    if write:
        key_pos = jnp.arange(lmax)
        allowed = (key_pos[None, :] <= q_pos[:, None])[None, None] & state.valid[
            :, None, None, :
        ]
    else:
        key_pos = jnp.arange(lmax)
        cache_ok = (key_pos[None, :] < offset) & state.valid  # (B, Lmax)
        cache_ok = jnp.repeat(cache_ok, n_beam, axis=0)
        chunk_causal = jnp.tril(jnp.ones((l, l), bool))
        allowed = jnp.concatenate(
            [
                jnp.broadcast_to(cache_ok[:, None, None, :], (b, 1, l, lmax)),
                jnp.broadcast_to(chunk_causal[None, None], (b, 1, l, l)),
            ],
            axis=-1,
        )

    x, new_kv = _run_layers(
        cfg,
        mdl["layers"],
        x,
        state.kv,
        cos,
        sin,
        allowed,
        offset,
        n_beam,
        write,
        valid=state.valid if write else None,
    )
    x = rms_norm(x, mdl["norm"]["weight"], cfg.rms_norm_eps)
    if last_logit_only:
        x = x[:, -1:]
    # Slice in case the quantized lm_head was block-padded (weights.kernelize).
    logits = dense(params["lm_head"], x)[..., : cfg.vocab_size]

    if write:
        new_offset = offset + (l if advance is None else advance)
        new_state = state._replace(kv=new_kv, offset=new_offset)
    else:
        new_state = state
    return ForwardResult(logits=logits, state=new_state)


def prefill(
    params: dict,
    cfg: ModelConfig,
    input_ids,
    *,
    max_tokens: int,
    pids=None,
    prompt_valid=None,
    inputs_embeds=None,
    last_logit_only: bool = False,
) -> ForwardResult:
    """Allocate a decode window and run the prompt through it.

    Equivalent to the reference's first ``model(**inputs, max_tokens=N)`` call
    which lazily creates cache/mask/rope (phi.py:580-583).
    """
    if inputs_embeds is not None:
        b, l = inputs_embeds.shape[:2]
    else:
        b, l = input_ids.shape
    compute_dtype = jnp.dtype(cfg.dtype)
    state = init_state(
        cfg,
        b,
        l,
        l + max_tokens,
        pids=pids,
        prompt_valid=prompt_valid,
        compute_dtype=compute_dtype,
    )
    return decode_forward(
        params, cfg, state, input_ids=input_ids, inputs_embeds=inputs_embeds,
        last_logit_only=last_logit_only,
    )


def prefill_ring(
    params: dict,
    cfg: ModelConfig,
    input_ids,
    mesh,
    *,
    max_tokens: int,
    seq_axis: str = "data",
    pids=None,
    prompt_valid=None,
) -> ForwardResult:
    """Sequence-parallel prefill: the prompt is sharded over ``seq_axis`` and
    attention runs as ring attention (parallel/ring_attention.py) — K/V blocks
    rotate over ICI while each device attends for its local queries.

    This is the context-parallel long-prompt path the reference cannot
    express (single-device, SURVEY.md §5): activations, attention, and the
    written cache columns are all L-sharded, so a prompt larger than one
    chip's HBM prefills across the mesh.  Returns the same
    (logits, DecodeState) contract as :func:`prefill`; decode then proceeds
    on the (possibly resharded) cache exactly as usual.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.ring_attention import make_ring_attention

    ring = make_ring_attention(mesh, seq_axis)
    b, l = input_ids.shape
    assert l % mesh.shape[seq_axis] == 0, (l, mesh.shape)
    state = init_state(
        cfg, b, l, l + max_tokens, pids=pids, prompt_valid=prompt_valid,
        compute_dtype=jnp.dtype(cfg.dtype),
    )
    mdl = params["model"]
    x = embedding(mdl["embed_tokens"], input_ids).astype(jnp.dtype(cfg.dtype))
    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, seq_axis, None))
    )
    cos = state.cos[:, :l]
    sin = state.sin[:, :l]
    if cos.shape[0] == 1 and b > 1:
        cos = jnp.broadcast_to(cos, (b,) + cos.shape[1:])
        sin = jnp.broadcast_to(sin, (b,) + sin.shape[1:])
    valid = state.valid[:, :l]
    light, heavy = _partition_heavy(mdl["layers"])

    def body(carry, xs):
        y, kv = carry
        lp, i = xs
        h = rms_norm(y, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
        qkv = _dense_at(lp, heavy, ("self_attn", "qkv_proj"), h, i)
        q, k, v = _qkv_split(cfg, qkv)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        entries = quantize_chunk(k, v, cfg.kv_quant, kv.quantized)
        kv = update_layer_chunk(kv, i, 0, entries)
        o = ring(q, k, v, valid).astype(y.dtype)
        bb, _, ll, _ = q.shape
        o = o.transpose(0, 2, 1, 3).reshape(bb, ll, -1)
        y = y + _dense_at(lp, heavy, ("self_attn", "o_proj"), o, i).astype(y.dtype)
        hh = rms_norm(y, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        gate_up = _dense_at(lp, heavy, ("mlp", "gate_up_proj"), hh, i)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        ff = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        y = y + _dense_at(lp, heavy, ("mlp", "down_proj"), ff, i).astype(y.dtype)
        return (y, kv), None

    (x, kv), _ = lax.scan(
        body, (x, state.kv), (light, jnp.arange(cfg.num_hidden_layers))
    )
    x = rms_norm(x, mdl["norm"]["weight"], cfg.rms_norm_eps)
    logits = dense(params["lm_head"], x)[..., : cfg.vocab_size]
    return ForwardResult(
        logits=logits,
        state=state._replace(kv=kv, offset=jnp.asarray(l, jnp.int32)),
    )


def forward_nocache(
    params: dict,
    cfg: ModelConfig,
    input_ids=None,
    *,
    pids=None,
    prompt_valid=None,
    inputs_embeds=None,
    dropout_rng=None,
    lora_dropout: float = 0.0,
    allow_flash: bool = True,
):
    """Single causal pass with no cache allocation — the reference's
    ``max_tokens=0`` mode used by ``_choose_from`` (phi_3_vision_mlx.py:475)
    and by the LoRA training loss (phi_3_vision_mlx.py:996-1004).

    ``dropout_rng`` + ``lora_dropout`` enable LoRA-branch dropout during
    training (reference LoRALinear dropout, phi.py:87,129-133).
    ``allow_flash=False`` keeps long sequences off the forward-only Pallas
    flash kernel — required under ``value_and_grad`` (the training loss sets
    it; inference scoring keeps the kernel).
    Returns logits only.
    """
    mdl = params["model"]
    if inputs_embeds is None:
        inputs_embeds = embedding(mdl["embed_tokens"], input_ids)
    x = inputs_embeds.astype(jnp.dtype(cfg.dtype))
    b, l, _ = x.shape
    if prompt_valid is None:
        prompt_valid = jnp.ones((b, l), bool)
    cos, sin = su_rope_tables(cfg, l, pids)
    if cos.shape[0] == 1 and b > 1:
        cos = jnp.broadcast_to(cos, (b,) + cos.shape[1:])
        sin = jnp.broadcast_to(sin, (b,) + sin.shape[1:])
    pos = jnp.arange(l)
    allowed = (pos[None, :] <= pos[:, None])[None, None] & prompt_valid[:, None, None, :]

    scale = cfg.head_dim**-0.5
    use_flash = allow_flash and _use_flash(l, l)
    use_dropout = dropout_rng is not None and lora_dropout > 0.0

    def _mask(layer_i, path, node, xin):
        if not (use_dropout and isinstance(node, dict) and "lora_a" in node):
            return None
        key = jax.random.fold_in(
            jax.random.fold_in(dropout_rng, layer_i), _PATH_IDS.get(path, 7)
        )
        keep = 1.0 - lora_dropout
        return jax.random.bernoulli(key, keep, xin.shape).astype(xin.dtype) / keep

    def body(carry, xs):
        lp, layer_i = xs
        h = rms_norm(carry, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
        node = lp["self_attn"]["qkv_proj"]
        qkv = dense(node, h, dropout_mask=_mask(layer_i, ("self_attn", "qkv_proj"), node, h))
        q, k, v = _qkv_split(cfg, qkv)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        if use_flash:
            from ..ops.kernels.flash_attention import flash_attention

            o = flash_attention(q, k, v, prompt_valid, jnp.int32(0), scale=scale)
        elif l >= 2048:
            # Long sequence without the (forward-only) flash kernel — e.g.
            # long-context TRAINING: differentiable O(L*block)-memory path.
            from ..ops.attention import blockwise_attention

            o = blockwise_attention(q, k, v, prompt_valid, scale)
        else:
            o = masked_attention(q, k, v, allowed, scale)
        bb, _, ll, _ = q.shape
        o = o.transpose(0, 2, 1, 3).reshape(bb, ll, -1)
        node = lp["self_attn"]["o_proj"]
        y = carry + dense(
            node, o, dropout_mask=_mask(layer_i, ("self_attn", "o_proj"), node, o)
        ).astype(carry.dtype)
        hh = rms_norm(y, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        node = lp["mlp"]["gate_up_proj"]
        gate_up = dense(
            node, hh, dropout_mask=_mask(layer_i, ("mlp", "gate_up_proj"), node, hh)
        )
        gate, up = jnp.split(gate_up, 2, axis=-1)
        node = lp["mlp"]["down_proj"]
        ff = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        mlp = dense(node, ff, dropout_mask=_mask(layer_i, ("mlp", "down_proj"), node, ff))
        return y + mlp.astype(carry.dtype), None

    x, _ = lax.scan(body, x, (mdl["layers"], jnp.arange(cfg.num_hidden_layers)))
    x = rms_norm(x, mdl["norm"]["weight"], cfg.rms_norm_eps)
    return dense(params["lm_head"], x)[..., : cfg.vocab_size]
