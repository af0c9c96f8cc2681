"""Functional decode state: the TPU-native answer to the reference's mutable
``KVCache`` / ``Mask4D`` / ``SuRoPE`` trio (/root/reference/phi.py:487-563).

Design stance (SURVEY.md §7): the reference's in-place cache writes, offset
mutation, and lazily-attached mask/rope objects become one explicit pytree,
``DecodeState``, threaded through jitted step functions with donated buffers.
The three cache behaviors the constrained decoder needs
(/root/reference/phi_3_vision_mlx.py:500-619) fall out naturally:

* **advance_offset=0** (score a forced suffix without committing): write the
  chunk at ``offset`` but return a state whose offset is unchanged — the next
  write simply overwrites it.
* **advance_offset=1** (commit exactly one token of an L-token chunk): write
  the chunk, advance offset by one.
* **beam repeat** (n_beam x batch vs a shared cache): a pure read-side
  ``jnp.repeat`` — no aliasing, no cache mutation.

The cache is preallocated dense ``(num_layers, B, KV, Lmax, D)`` — one
buffer per generation, updated via ``lax.dynamic_update_slice`` (the XLA
equivalent of the reference's in-place offset writes, phi.py:541-548).  The
quantized variant stores a uint8 payload plus group-32 affine scales/biases
along the head dim, matching the reference's 4-bit group-32 KV quantization
(phi.py:528-540) — but unlike the reference, *every* written chunk is
quantized (the reference appends fp chunks and re-concatenates per step,
which is why its quantized-cache decode is 3-4x slower; ours is not).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import KVQuantConfig, ModelConfig
from ..ops.rope import su_rope_tables


class KVCache(NamedTuple):
    """Per-generation KV store, stacked over layers (for ``lax.scan``).

    Dense mode: ``k``/``v`` are (num_layers, B, KV, Lmax, D) in the compute
    dtype; scale/bias fields are None.
    Quantized mode: ``k``/``v`` are uint8 payloads of the same shape; scales
    and biases are (num_layers, B, KV, Lmax, D // group) float32.
    """

    k: jax.Array
    v: Optional[jax.Array] = None
    k_scales: Optional[jax.Array] = None
    k_biases: Optional[jax.Array] = None
    v_scales: Optional[jax.Array] = None
    v_biases: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None


class DecodeState(NamedTuple):
    """Everything a decode step needs besides the weights.

    offset: () int32 — number of committed cache positions (shared by rows;
      left-padding keeps rows aligned, as in the reference's batch semantics).
    valid:  (B, Lmax) bool — key visibility: False at left-pad positions
      (reference ``Mask4D`` padding merge, phi.py:550-563) and anywhere an
      attention-dropout mask zeroed a position (train_lora ``mask_ratios``).
    cos/sin: (B|1, Lmax, D) float32 — SuRoPE tables precomputed once for the
      whole window and sliced per step (reference SuRoPE, phi.py:487-507).
    """

    kv: KVCache
    offset: jax.Array
    valid: jax.Array
    cos: jax.Array
    sin: jax.Array

    @property
    def batch(self) -> int:
        return self.valid.shape[0]

    @property
    def window(self) -> int:
        return self.valid.shape[1]


def _layer_kv_shape(cfg: ModelConfig, batch: int, l_all: int):
    return (
        cfg.num_hidden_layers,
        batch,
        cfg.num_key_value_heads,
        l_all,
        cfg.head_dim,
    )


def init_state(
    cfg: ModelConfig,
    batch: int,
    prompt_len: int,
    l_all: int,
    pids=None,
    prompt_valid=None,
    compute_dtype=jnp.bfloat16,
) -> DecodeState:
    """Allocate a fresh decode window (jit-friendly; all shapes static).

    Args:
      prompt_len: (padded) prompt length — positions >= prompt_len start valid
        (they will be decode tokens).
      l_all: full window = prompt_len + max_tokens (rounded up by the engine).
      pids: optional (B, prompt_len) per-row position ids for left-padded
        batches (reference Phi3FProcessor, phi.py:233-245).
      prompt_valid: optional (B, prompt_len) bool key-validity for the prompt.
    """
    shape = _layer_kv_shape(cfg, batch, l_all)
    if cfg.use_quantized_cache:
        g = cfg.kv_quant.group_size
        assert cfg.head_dim % g == 0 or g % cfg.head_dim == 0
        groups = max(1, cfg.head_dim // g)
        # TRANSPOSED storage: payload (nl, B, KV, D, Lmax) and scales
        # (nl, B, KV, G, Lmax), both with the long axis last — (L, G) layouts
        # would physically pad G to 128 lanes (42x memory/bandwidth bloat),
        # and the transposed form lets the Pallas kernel expand per-group
        # scales with a sublane tile-repeat (ops/kernels/kv_attention.py).
        # bf16 scale/bias; kernels and the XLA path accumulate in f32.
        # Fused + nibble-packed: byte (r, l) of ``k`` holds k-dim r in the low
        # nibble and v-dim r in the high nibble — one DMA streams both, at
        # half the bytes of one-nibble-per-byte storage.  ``k_scales`` holds
        # [k_scale; k_bias; v_scale; v_bias] rows (4G, L).
        nl_, b_, kvh_, l_, d_ = shape
        payload_rows = d_ if cfg.kv_quant.bits == 4 else 2 * d_
        kv = KVCache(
            k=jnp.zeros((nl_, b_, kvh_, payload_rows, l_), jnp.uint8),
            k_scales=jnp.zeros((nl_, b_, kvh_, 4 * groups, l_), jnp.bfloat16),
        )
    else:
        kv = KVCache(k=jnp.zeros(shape, compute_dtype), v=jnp.zeros(shape, compute_dtype))
    if prompt_valid is None:
        prompt_valid = jnp.ones((batch, prompt_len), bool)
    valid = jnp.concatenate(
        [prompt_valid.astype(bool), jnp.ones((batch, l_all - prompt_len), bool)],
        axis=1,
    )
    cos, sin = su_rope_tables(cfg, l_all, pids)
    return DecodeState(
        kv=kv, offset=jnp.zeros((), jnp.int32), valid=valid, cos=cos, sin=sin
    )


# ---------------------------------------------------------------------------
# KV quantization (group-32 affine along head_dim; reference phi.py:532-537)
# ---------------------------------------------------------------------------


def _kv_quantize(x, kvq: KVQuantConfig):
    """x: (..., D) float -> (payload uint8, scales, biases) with D-dim groups."""
    *lead, d = x.shape
    g = min(kvq.group_size, d)
    groups = d // g
    levels = (1 << kvq.bits) - 1
    xf = x.astype(jnp.float32).reshape(*lead, groups, g)
    lo = xf.min(axis=-1)
    hi = xf.max(axis=-1)
    scale = (hi - lo) / levels
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round((xf - lo[..., None]) / scale[..., None]), 0, levels)
    return (
        q.reshape(*lead, d).astype(jnp.uint8),
        scale.astype(jnp.bfloat16),
        lo.astype(jnp.bfloat16),
    )


def _kv_dequantize(q, scales, biases, dtype):
    *lead, d = q.shape
    groups = scales.shape[-1]
    g = d // groups
    qf = q.astype(jnp.float32).reshape(*lead, groups, g)
    x = qf * scales[..., None] + biases[..., None]
    return x.reshape(*lead, d).astype(dtype)


# ---------------------------------------------------------------------------
# Per-layer cache read/write (used inside the layer scan)
# ---------------------------------------------------------------------------


class LayerKV(NamedTuple):
    """One layer's slice of the cache (fields mirror KVCache minus the
    leading layer axis)."""

    k: jax.Array
    v: Optional[jax.Array] = None
    k_scales: Optional[jax.Array] = None
    k_biases: Optional[jax.Array] = None
    v_scales: Optional[jax.Array] = None
    v_biases: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None


def quantize_chunk(k_new, v_new, kvq: KVQuantConfig, quantized: bool):
    """Fresh (B, KV, L, D) chunk -> cache entries.

    Quantized entries come out in the cache's transposed nibble-packed
    layout: payload (B, KV, D, L) with byte (r, l) = k | (v << 4) at
    row-interleaved head dim r (row r = original dim (r % G)*gs + r//G);
    scales/biases fused as (B, KV, 4G, L)."""
    if not quantized:
        return LayerKV(k=k_new, v=v_new)
    from ..ops.kernels.kv_attention import d_perm

    kq, ks, kb = _kv_quantize(k_new, kvq)
    vq, vs, vb = _kv_quantize(v_new, kvq)
    perm = d_perm(kq.shape[-1], ks.shape[-1])
    t = lambda a: jnp.swapaxes(a, -1, -2)
    if kvq.bits == 4:  # nibble-pack k (lo) with v (hi): half the bytes
        payload = t(kq[..., perm]) | (t(vq[..., perm]) << 4)
    else:  # 8-bit: stack k rows over v rows
        payload = jnp.concatenate([t(kq[..., perm]), t(vq[..., perm])], axis=-2)
    scales = jnp.concatenate([t(ks), t(kb), t(vs), t(vb)], axis=-2)
    return LayerKV(k=payload, k_scales=scales)


def index_layer(kv: KVCache, i) -> LayerKV:
    """Read view of layer ``i`` from the stacked cache (dynamic index)."""
    return LayerKV(
        *(
            None if f is None else lax.dynamic_index_in_dim(f, i, 0, keepdims=False)
            for f in kv
        )
    )


def update_layer_chunk(kv: KVCache, i, offset, entries: LayerKV) -> KVCache:
    """Write a fresh chunk's cache entries into layer ``i`` at ``offset``.

    Only the chunk's columns are written — O(tokens), not O(window) — which
    is what lets decode scale to 128K windows (the scan carries the cache;
    XLA updates the donated buffers in place).
    """
    quantized = kv.quantized

    def upd(full, chunk):
        if full is None or chunk is None:
            return None
        idx = (i, 0, 0, 0, offset) if quantized else (i, 0, 0, offset, 0)
        return lax.dynamic_update_slice(full, chunk[None].astype(full.dtype), idx)

    return KVCache(
        k=upd(kv.k, entries.k),
        v=upd(kv.v, entries.v),
        k_scales=upd(kv.k_scales, entries.k_scales),
        k_biases=upd(kv.k_biases, entries.k_biases),
        v_scales=upd(kv.v_scales, entries.v_scales),
        v_biases=upd(kv.v_biases, entries.v_biases),
    )


def read_kv(lkv: LayerKV, dtype, kv_bits: int = 4):
    """Materialize the full (B, KV, Lmax, D) k/v views in ``dtype``.

    XLA fallback; the Pallas decode-attention kernel reads the quantized
    payload directly instead.  ``kv_bits`` selects the payload layout:
    4-bit is nibble-packed [k | v<<4] (rows = D), 8-bit stacks k over v
    (rows = 2D).
    """
    if lkv.quantized:
        from ..ops.kernels.kv_attention import d_unperm

        t = lambda a: jnp.swapaxes(a, -1, -2)  # transposed storage -> (L, D)
        g = lkv.k_scales.shape[-2] // 4
        if kv_bits == 4:
            d = lkv.k.shape[-2]
            kq, vq = lkv.k & 15, lkv.k >> 4  # nibble-packed [k | v<<4]
        else:
            d = lkv.k.shape[-2] // 2
            kq, vq = lkv.k[..., :d, :], lkv.k[..., d:, :]
        unperm = d_unperm(d, g)
        sc = lkv.k_scales
        ks, kb, vs, vb = (sc[..., i * g : (i + 1) * g, :] for i in range(4))
        k = _kv_dequantize(t(kq)[..., unperm], t(ks), t(kb), dtype)
        v = _kv_dequantize(t(vq)[..., unperm], t(vs), t(vb), dtype)
        return k, v
    return lkv.k.astype(dtype), lkv.v.astype(dtype)
