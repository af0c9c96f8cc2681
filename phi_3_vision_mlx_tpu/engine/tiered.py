"""Tiered KV cache: 64K-128K-token windows on ONE chip via host memory.

The reference serves a 128K context on a single 64 GB Mac through its
group-32 quantized KV cache (/root/reference/phi.py:528-540).  A fractional
TPU subslice has ~8 GB of HBM: the packed int4 cache alone is ~8 GB at 64K
and ~16 GB at 128K, so the in-HBM path tops out at 48K (ROADMAP r3).  This
module closes that capability gap by TIERING the cache:

* **Cold tier** — the (immutable after prefill) prompt KV lives in
  ``pinned_host`` memory as per-chunk arrays ``(nl, B, KV, D, PC)`` uint8
  payload + ``(nl, B, KV, 4G, PC)`` bf16 scales (the packed transposed
  layout of engine/state.py).  Inside the jitted step a ``lax.scan`` over
  layers takes the cold arrays as scan inputs: XLA slices them per layer
  IN HOST MEMORY and ``jax.device_put`` streams just that layer's columns
  over PCIe (measured ~14 GB/s effective on this fraction; a 12.9 GB host
  scan runs without touching the HBM ceiling).

* **Hot tier** — a small HBM window holds the decode tail; fresh KV is
  quantized and written there exactly like the standard path.

Per-layer attention is an exact two-part online-softmax combine: streamed
blockwise stats over the cold tier + stats over the hot window.  Numerics
match the in-HBM quantized-cache path to float tolerance and greedy decode
is token-identical (tests/test_tiered.py).

Prefill evicts as it goes: the prompt runs in PC-token chunks; each chunk's
quantized KV is emitted straight to ``pinned_host`` via ``out_shardings``
(no device-resident copy ever exists), and subsequent chunks stream the
chunks already evicted.  Chunk programs are compiled per power-of-two cold
slot count (dummy slots are masked), bounding remote compiles at
``log2(n_chunks)+2`` for any window.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.config import ModelConfig
from ..models import phi3
from ..models.phi3 import _dense_at, _partition_heavy, _qkv_split
from ..ops.linear import dense, embedding
from ..ops.norms import rms_norm
from ..ops.rope import apply_rotary, su_rope_tables
from .state import (
    KVCache,
    LayerKV,
    index_layer,
    init_state,
    quantize_chunk,
    read_kv,
    update_layer_chunk,
)

NEG_INF = float(np.finfo(np.float32).min)


def _host_sharding():
    dev = jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")


def _dev_sharding():
    dev = jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(dev, memory_kind="device")


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


# ---------------------------------------------------------------------------
# Exact partial-attention stats (online-softmax pieces that combine exactly)
# ---------------------------------------------------------------------------


class AttnStats(NamedTuple):
    m: jax.Array  # (B, KV, G, Lq) running max
    l: jax.Array  # (B, KV, G, Lq) running sum of exp
    acc: jax.Array  # (B, KV, G, Lq, D) unnormalized output


def _zero_stats(b, kv, g, lq, d):
    return AttnStats(
        m=jnp.full((b, kv, g, lq), NEG_INF, jnp.float32),
        l=jnp.zeros((b, kv, g, lq), jnp.float32),
        acc=jnp.zeros((b, kv, g, lq, d), jnp.float32),
    )


def _fold_q(q, kv_heads: int):
    """(B, H, Lq, D) -> (B, KV, H//KV, Lq, D) GQA grouping."""
    b, h, lq, d = q.shape
    return q.reshape(b, kv_heads, h // kv_heads, lq, d)


def _bf16_dots() -> bool:
    """bf16-input / fp32-accumulate attention dots in the tiered path.

    The fp32-input einsums were the measured compute wall under the PCIe
    stream: every layer materialized fp32 copies of the dequantized cold
    K/V (4x the payload bytes at 64K) and ran the MXU at its 8x-slower fp32
    rate — enough to serialize behind the host->device copy that layer
    prefetch is supposed to hide.  bf16 inputs with fp32 accumulation are
    the same numerics class as the Pallas decode/flash kernels the in-HBM
    path already trusts.  Default: on for accelerators, off for CPU (the
    CPU parity tests diff tiered vs in-HBM XLA at 3e-3, which fp32 meets
    and bf16 intentionally trades away); PHI3V_TPU_TIERED_BF16=0/1
    overrides.
    """
    env = os.environ.get("PHI3V_TPU_TIERED_BF16")
    if env is not None:
        return env != "0"
    return jax.default_backend() != "cpu"


def _update_stats(st: AttnStats, s, v):
    """One key-block update.  s: (B,KV,G,Lq,Lk) f32 scores (already masked
    with NEG_INF); v: (B,KV,Lk,D)."""
    m_blk = s.max(axis=-1)
    m_new = jnp.maximum(st.m, m_blk)
    # all-masked-so-far rows keep m=NEG_INF; exp(NEG_INF - NEG_INF) would be
    # exp(0)=1, so guard the rescale of the (all-zero) accumulator.
    alpha = jnp.where(st.m > NEG_INF / 2, jnp.exp(st.m - m_new), 0.0)
    p = jnp.exp(s - m_new[..., None])
    l_new = alpha * st.l + p.sum(axis=-1)
    if _bf16_dots():
        upd = jnp.einsum(
            "bkgql,bkld->bkgqd", p.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
        )
    else:
        upd = jnp.einsum("bkgql,bkld->bkgqd", p, v.astype(jnp.float32))
    acc = st.acc * alpha[..., None] + upd
    return AttnStats(m=m_new, l=l_new, acc=acc)


def _stats_over(q, k, v, key_ok, scale, k_block: int, carry: AttnStats,
                q_pos=None, key_pos0=None):
    """Accumulate stats of q against (k, v) in key blocks.

    q: (B, KV, G, Lq, D); k, v: (B, KV, Lk, D); key_ok: (B, Lk) bool.
    q_pos (Lq,) + key_pos0 (scalar) add a causal condition
    (key_pos <= q_pos) on top of key_ok.
    """
    b, kvh, g, lq, d = q.shape
    lk = k.shape[2]
    k_block = min(k_block, lk)
    while lk % k_block:
        k_block //= 2
    nblk = lk // k_block

    def body(st, i):
        ks = lax.dynamic_slice_in_dim(k, i * k_block, k_block, 2)
        vs = lax.dynamic_slice_in_dim(v, i * k_block, k_block, 2)
        ok = lax.dynamic_slice_in_dim(key_ok, i * k_block, k_block, 1)
        allowed = ok[:, None, None, None, :]  # (B,1,1,1,Lk)
        if q_pos is not None:
            kp = key_pos0 + i * k_block + jnp.arange(k_block)
            allowed = allowed & (kp[None, :] <= q_pos[:, None])[None, None, None]
        if _bf16_dots():
            s = jnp.einsum(
                "bkgqd,bkld->bkgql", q.astype(jnp.bfloat16),
                ks.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * scale
        else:
            s = jnp.einsum(
                "bkgqd,bkld->bkgql", (q * scale).astype(jnp.float32),
                ks.astype(jnp.float32),
            )
        s = jnp.where(allowed, s, NEG_INF)
        return _update_stats(st, s, vs), None

    st, _ = lax.scan(body, carry, jnp.arange(nblk))
    return st


def _finalize(st: AttnStats, dtype):
    l = jnp.where(st.l == 0.0, 1.0, st.l)
    o = st.acc / l[..., None]  # (B,KV,G,Lq,D)
    b, kvh, g, lq, d = o.shape
    return o.reshape(b, kvh * g, lq, d).astype(dtype)


def _dequant_cold(payload, scales, bits: int, dtype):
    """Cold slot (B,KV,D|2D,PC) payload + (B,KV,4G,PC) scales -> k, v
    (B,KV,PC,D) via the packed-layout reader (engine/state.py:read_kv)."""
    return read_kv(LayerKV(k=payload, k_scales=scales), dtype, bits)


def _stats_over_packed(q, payload, scales, key_ok, scale, k_block: int,
                       carry: AttnStats, bits: int, dtype,
                       q_pos=None, key_pos0=None):
    """Like :func:`_stats_over`, but dequantizes the packed cold layout
    PER KEY BLOCK inside the scan body instead of materializing the whole
    chunk's (B, KV, PC, D) bf16 k/v up front.

    Numerics are bit-identical (dequant is per-column, so it commutes with
    the block slicing); what changes is liveness: the full-chunk dequant
    kept ~2x(B*KV*PC*D) bf16 live across the whole stats scan (~200 MB per
    8192-token chunk), which the r4 roofline named as the memory pressure
    throttling the layer-prefetch PCIe overlap.  Blockwise, peak extra
    memory is ~2x(B*KV*k_block*D) (~25 MB at k_block=2048) and the
    dequantized block dies inside its scan iteration.
    """
    b, kvh, g, lq, d = q.shape
    lk = payload.shape[-1]
    k_block = min(k_block, lk)
    while lk % k_block:
        k_block //= 2
    nblk = lk // k_block

    def body(st, i):
        pblk = lax.dynamic_slice_in_dim(payload, i * k_block, k_block, 3)
        sblk = lax.dynamic_slice_in_dim(scales, i * k_block, k_block, 3)
        ks, vs = read_kv(LayerKV(k=pblk, k_scales=sblk), dtype, bits)
        ok = lax.dynamic_slice_in_dim(key_ok, i * k_block, k_block, 1)
        allowed = ok[:, None, None, None, :]  # (B,1,1,1,Lk)
        if q_pos is not None:
            kp = key_pos0 + i * k_block + jnp.arange(k_block)
            allowed = allowed & (kp[None, :] <= q_pos[:, None])[None, None, None]
        if _bf16_dots():
            s = jnp.einsum(
                "bkgqd,bkld->bkgql", q.astype(jnp.bfloat16),
                ks.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * scale
        else:
            s = jnp.einsum(
                "bkgqd,bkld->bkgql", (q * scale).astype(jnp.float32),
                ks.astype(jnp.float32),
            )
        s = jnp.where(allowed, s, NEG_INF)
        return _update_stats(st, s, vs), None

    st, _ = lax.scan(body, carry, jnp.arange(nblk))
    return st


# ---------------------------------------------------------------------------
# The tiered layer pass (shared by prefill chunks and decode steps)
# ---------------------------------------------------------------------------


def _tiered_layers(cfg: ModelConfig, layer_params, x, hot_kv: Optional[KVCache],
                   cold_k: Tuple, cold_s: Tuple, cold_valid, cos, sin,
                   hot_offset, hot_valid, *, k_block: int, dev_sharding,
                   dev0: Optional[Tuple] = None):
    """Run all decoder layers with two-tier attention.

    cold_k / cold_s: tuples of per-chunk stacked host arrays
    (nl, B, KV, rows, PC); passed as scan xs so XLA host-slices per layer
    and the body streams one layer's columns to device.
    hot_kv: None during prefill (the chunk's own KV plays the "hot" role
    via self-attention and is returned for eviction).
    Returns (x, new_hot_kv, evicted (nl,B,KV,rows,L) + scales or None).

    dev0: PREFETCH mode — ``(dev0_k, dev0_s)`` device-resident layer-0
    slices per chunk.  The cold arrays must then be stored ROLLED by -1 on
    the layer axis (index j holds layer j+1): iteration i computes layer i
    from device copies carried in from iteration i-1 while STARTING the
    copy of layer i+1 from its xs slice, so the PCIe stream overlaps the
    layer compute (measured at the link ceiling in
    experiments/tiered_overlap.py scanpre vs 24% slower serialized).
    The last iteration's fetch wraps to layer 0 and is discarded
    (~1/nl wasted bandwidth).
    """
    nl = cfg.num_hidden_layers
    light, heavy = _partition_heavy(layer_params)
    scale = cfg.head_dim ** -0.5
    b, lq, _ = x.shape
    kvh, g = cfg.num_key_value_heads, cfg.num_attention_heads // cfg.num_key_value_heads
    prefetch = dev0 is not None

    def body(carry, xs):
        if prefetch:
            y, hkv, cur_k, cur_s = carry
            lp, i, ck, cs = xs  # ck/cs: NEXT layer's host slices (rolled)
            nxt_k = tuple(jax.device_put(c, dev_sharding) for c in ck)
            nxt_s = tuple(jax.device_put(c, dev_sharding) for c in cs)
        else:
            y, hkv = carry
            lp, i, ck, cs = xs
        h = rms_norm(y, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
        qkv = _dense_at(lp, heavy, ("self_attn", "qkv_proj"), h, i)
        q, k, v = _qkv_split(cfg, qkv)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        qg = _fold_q(q, kvh)

        st = _zero_stats(b, kvh, g, lq, cfg.head_dim)
        # cold tier: this layer's columns (prefetched device copies in
        # prefetch mode; streamed host->device here otherwise); dequant is
        # blockwise inside the stats scan (memory-pressure relief for the
        # prefetch overlap — see _stats_over_packed)
        col0 = 0
        for ci in range(len(ck)):
            if prefetch:
                ck_d, cs_d = cur_k[ci], cur_s[ci]
            else:
                ck_d = jax.device_put(ck[ci], dev_sharding)
                cs_d = jax.device_put(cs[ci], dev_sharding)
            pc = ck_d.shape[-1]
            ok = lax.dynamic_slice_in_dim(cold_valid, col0, pc, 1)
            st = _stats_over_packed(qg, ck_d, cs_d, ok, scale, k_block, st,
                                    cfg.kv_quant.bits, y.dtype)
            col0 += pc

        if hkv is not None:
            # decode: write the fresh chunk into the hot window, attend over it
            entries = quantize_chunk(k, v, cfg.kv_quant, hkv.quantized)
            hkv = update_layer_chunk(hkv, i, hot_offset, entries)
            kh, vh = read_kv(index_layer(hkv, i), y.dtype, cfg.kv_quant.bits)
            hot_pos = jnp.arange(kh.shape[2])
            ok_h = hot_valid & (hot_pos <= hot_offset + lq - 1)[None, :]
            st = _stats_over(qg, kh, vh, ok_h, scale, k_block, st,
                             q_pos=hot_offset + jnp.arange(lq), key_pos0=0)
            evicted = None
        else:
            # prefill chunk: causal self-attention (quantize-then-read so the
            # numerics match what later chunks/decodes will see)
            entries = quantize_chunk(k, v, cfg.kv_quant, True)
            ok_self = hot_valid  # (B, lq): this chunk's own validity
            st = _stats_over_packed(qg, entries.k, entries.k_scales, ok_self,
                                    scale, k_block, st, cfg.kv_quant.bits,
                                    y.dtype, q_pos=jnp.arange(lq), key_pos0=0)
            evicted = entries

        o = _finalize(st, y.dtype).transpose(0, 2, 1, 3).reshape(b, lq, -1)
        y = y + _dense_at(lp, heavy, ("self_attn", "o_proj"), o, i).astype(y.dtype)
        h = rms_norm(y, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        gate_up = _dense_at(lp, heavy, ("mlp", "gate_up_proj"), h, i)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        mlp = _dense_at(
            lp, heavy, ("mlp", "down_proj"),
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up, i,
        )
        y = y + mlp.astype(y.dtype)
        if prefetch:
            return (y, hkv, nxt_k, nxt_s), evicted
        return (y, hkv), evicted

    xs = (light, jnp.arange(nl), cold_k, cold_s)
    if prefetch:
        init = (x, hot_kv, tuple(dev0[0]), tuple(dev0[1]))
        (x, hot_kv, _, _), evicted = lax.scan(body, init, xs)
    else:
        (x, hot_kv), evicted = lax.scan(body, (x, hot_kv), xs)
    return x, hot_kv, evicted


# ---------------------------------------------------------------------------
# Tiered state + prefill + decode
# ---------------------------------------------------------------------------


class TieredState:
    """Host-managed two-tier decode state (NOT a jit pytree — the cold tier
    is a list of pinned_host arrays threaded explicitly)."""

    def __init__(self, cfg, cold_k: List, cold_s: List, cold_valid, hot,
                 cos, sin, C: int, PC: int, dev0_k: Optional[List] = None,
                 dev0_s: Optional[List] = None):
        self.cfg = cfg
        self.cold_k = cold_k  # list of (nl,B,KV,rows,PC) uint8 pinned_host
        self.cold_s = cold_s  # list of (nl,B,KV,4G,PC) bf16 pinned_host
        self.cold_valid = cold_valid  # (B, C) bool device
        self.hot = hot  # DecodeState over the hot window (offset hot-relative)
        self.cos = cos  # (B|1, C+H, D) full-window rope tables
        self.sin = sin
        self.C = C
        self.PC = PC
        # Prefetch mode: cold arrays are layer-rolled and these hold each
        # chunk's layer-0 slices on device ((B,KV,rows,PC) each).
        self.dev0_k = dev0_k
        self.dev0_s = dev0_s

    @property
    def prefetch(self) -> bool:
        return self.dev0_k is not None

    @property
    def window(self) -> int:
        return self.C + self.hot.window

    @property
    def offset_abs(self):
        return self.C + int(self.hot.offset)


def _pad_to_chunks(dict_input, pc: int):
    from .engine import pad_prompt_inputs

    ids = np.asarray(dict_input["input_ids"])
    l = ids.shape[1]
    l_pad = max(-(-l // pc) * pc, pc)
    return pad_prompt_inputs(dict_input, l_pad) + (l_pad,)


class TieredEngine:
    """Prefill-with-eviction + streamed decode over a tiered cache.

    Usage::

        eng = TieredEngine(lm, chunk=8192, hot=512)
        state = eng.prefill(dict_input)           # cold tier fills up
        tok, state = eng.first_token(state)
        for _ in range(n):
            tok, state = eng.decode_step(state, tok)
    """

    def __init__(self, lm, chunk: int = 4096, hot: int = 512,
                 k_block: int = 2048, prefetch: Optional[bool] = None):
        import os

        cfg = lm.cfg
        if not cfg.use_quantized_cache:
            cfg = cfg.replace(use_quantized_cache=True)
        self.lm = lm
        self.cfg = cfg
        self.pc = int(chunk)
        self.hot_window = int(hot)
        self.k_block = int(k_block)
        # Prefetch: store the cold tier layer-rolled and fetch layer i+1
        # while layer i computes (see _tiered_layers dev0).  Measured at
        # the PCIe link ceiling vs ~24%+ slower serialized.
        if prefetch is None:
            prefetch = os.environ.get(
                "PHI3V_TPU_TIERED_PREFETCH", "1") != "0"
        self.prefetch = bool(prefetch)
        self._prefill_fns = {}
        self._decode_fns = {}
        self._dummy = None  # shared masked filler for pow2 slot padding
        self._dummy0 = None  # its layer-0 device slice (prefetch mode)

    # -- compiled programs --------------------------------------------------

    def _dummy_slot(self):
        if self._dummy is None:
            cfg = self.cfg
            nl, kvh, d = (cfg.num_hidden_layers, cfg.num_key_value_heads,
                          cfg.head_dim)
            g = max(1, d // cfg.kv_quant.group_size)
            rows = d if cfg.kv_quant.bits == 4 else 2 * d
            host = _host_sharding()
            self._dummy = (
                jax.device_put(jnp.zeros((nl, 1, kvh, rows, self.pc), jnp.uint8), host),
                jax.device_put(jnp.ones((nl, 1, kvh, 4 * g, self.pc), jnp.bfloat16), host),
            )
        return self._dummy

    def _dummy_dev0(self):
        if self._dummy0 is None:
            cfg = self.cfg
            kvh, d = cfg.num_key_value_heads, cfg.head_dim
            g = max(1, d // cfg.kv_quant.group_size)
            rows = d if cfg.kv_quant.bits == 4 else 2 * d
            self._dummy0 = (
                jnp.zeros((1, kvh, rows, self.pc), jnp.uint8),
                jnp.ones((1, kvh, 4 * g, self.pc), jnp.bfloat16),
            )
        return self._dummy0

    def _prefill_fn(self, b: int, n_slots: int, w: int):
        key = (b, n_slots, w)
        if key in self._prefill_fns:
            return self._prefill_fns[key]
        cfg, pc, kb = self.cfg, self.pc, self.k_block
        dev = _dev_sharding()
        host = _host_sharding()

        prefetch = self.prefetch

        def fn(params, ids, cold_k, cold_s, cold_valid, valid_self, cos, sin,
               dev0_k, dev0_s):
            mdl = params["model"]
            x = embedding(mdl["embed_tokens"], ids).astype(jnp.dtype(cfg.dtype))
            x, _, evicted = _tiered_layers(
                cfg, mdl["layers"], x, None, cold_k, cold_s, cold_valid,
                cos, sin, None, valid_self, k_block=kb, dev_sharding=dev,
                dev0=(dev0_k, dev0_s) if prefetch else None,
            )
            x = rms_norm(x[:, -1:], mdl["norm"]["weight"], cfg.rms_norm_eps)
            logits = dense(params["lm_head"], x)[..., : cfg.vocab_size]
            if prefetch:
                # emit the cold copy layer-ROLLED (index j = layer j+1) plus
                # the layer-0 slice kept on device to seed the next
                # program's carry
                return (logits[:, 0].astype(jnp.float32),
                        jnp.roll(evicted.k, -1, axis=0),
                        jnp.roll(evicted.k_scales, -1, axis=0),
                        evicted.k[0], evicted.k_scales[0])
            return logits[:, 0].astype(jnp.float32), evicted.k, evicted.k_scales

        if jax.default_backend() == "tpu":
            # evicted KV streams straight to pinned host as a program output
            shardings = ((dev, host, host, dev, dev) if prefetch
                         else (dev, host, host))
            jfn = jax.jit(fn, out_shardings=shardings)
        else:
            # CPU backend can't annotate output placement; eager-move after
            jfn_dev = jax.jit(fn)

            def jfn(*args):
                out = jfn_dev(*args)
                return (out[0], jax.device_put(out[1], host),
                        jax.device_put(out[2], host)) + tuple(out[3:])

        self._prefill_fns[key] = jfn
        return self._prefill_fns[key]

    def _decode_fn(self, b: int, n_chunks: int, C: int):
        key = (b, n_chunks, C)
        if key in self._decode_fns:
            return self._decode_fns[key]
        cfg, kb = self.cfg, self.k_block
        dev = _dev_sharding()

        prefetch = self.prefetch

        def fn(params, tok, hot_kv_tree, hot_offset, hot_valid, cold_k,
               cold_s, cold_valid, cos, sin, dev0_k, dev0_s):
            hot_kv = KVCache(*hot_kv_tree)
            mdl = params["model"]
            x = embedding(mdl["embed_tokens"], tok).astype(jnp.dtype(cfg.dtype))
            pos = C + hot_offset
            cos_t = lax.dynamic_slice_in_dim(cos, pos, 1, axis=1)
            sin_t = lax.dynamic_slice_in_dim(sin, pos, 1, axis=1)
            if cos_t.shape[0] == 1 and x.shape[0] > 1:
                cos_t = jnp.broadcast_to(cos_t, (x.shape[0],) + cos_t.shape[1:])
                sin_t = jnp.broadcast_to(sin_t, (x.shape[0],) + sin_t.shape[1:])
            x, hot_kv, _ = _tiered_layers(
                cfg, mdl["layers"], x, hot_kv, cold_k, cold_s, cold_valid,
                cos_t, sin_t, hot_offset, hot_valid, k_block=kb,
                dev_sharding=dev,
                dev0=(dev0_k, dev0_s) if prefetch else None,
            )
            x = rms_norm(x[:, -1:], mdl["norm"]["weight"], cfg.rms_norm_eps)
            logits = dense(params["lm_head"], x)[..., : cfg.vocab_size]
            return logits[:, 0].astype(jnp.float32), tuple(hot_kv)

        self._decode_fns[key] = jax.jit(fn, donate_argnums=(2,))
        return self._decode_fns[key]

    # -- public API ----------------------------------------------------------

    def prefill(self, dict_input: dict) -> Tuple[np.ndarray, TieredState]:
        """Chunked prefill with per-chunk eviction to host memory.

        Returns (last-position logits (B, V) f32, state).
        """
        lm, cfg, pc = self.lm, self.cfg, self.pc
        ids_p, pids_p, valid_p, l_pad = _pad_to_chunks(dict_input, pc)
        b = ids_p.shape[0]
        n_chunks = l_pad // pc
        W = l_pad + self.hot_window
        cos, sin = su_rope_tables(cfg, W, jnp.asarray(pids_p))
        host = _host_sharding()
        cold_k: List = []
        cold_s: List = []
        dev0_k: List = []
        dev0_s: List = []
        valid_dev = jnp.asarray(valid_p)
        logits = None
        for c in range(n_chunks):
            n_slots = _next_pow2(c) if c else 0
            fn = self._prefill_fn(b, n_slots, W)
            dk, ds = (self._dummy_slot() if n_slots > c else (None, None))
            slots_k = tuple(cold_k[:c]) + tuple([dk] * (n_slots - c))
            slots_s = tuple(cold_s[:c]) + tuple([ds] * (n_slots - c))
            if self.prefetch:
                d0k, d0s = (self._dummy_dev0() if n_slots > c
                            else (None, None))
                slots0_k = tuple(dev0_k[:c]) + tuple([d0k] * (n_slots - c))
                slots0_s = tuple(dev0_s[:c]) + tuple([d0s] * (n_slots - c))
            else:
                slots0_k = slots0_s = ()
            # validity over the n_slots*pc cold columns this program sees
            cv = np.zeros((b, max(n_slots, 1) * pc), bool)
            cv[:, : c * pc] = valid_p[:, : c * pc]
            cos_c = lax.dynamic_slice_in_dim(cos, c * pc, pc, axis=1)
            sin_c = lax.dynamic_slice_in_dim(sin, c * pc, pc, axis=1)
            out = fn(
                lm.params, jnp.asarray(ids_p[:, c * pc : (c + 1) * pc]),
                slots_k, slots_s, jnp.asarray(cv),
                valid_dev[:, c * pc : (c + 1) * pc], cos_c, sin_c,
                slots0_k, slots0_s,
            )
            logits, ev_k, ev_s = out[:3]
            cold_k.append(ev_k)
            cold_s.append(ev_s)
            if self.prefetch:
                dev0_k.append(out[3])
                dev0_s.append(out[4])
        hot = init_state(cfg, b, 0, self.hot_window,
                         compute_dtype=jnp.dtype(cfg.dtype))
        state = TieredState(cfg, cold_k, cold_s, valid_dev, hot, cos, sin,
                            C=l_pad, PC=pc,
                            dev0_k=dev0_k if self.prefetch else None,
                            dev0_s=dev0_s if self.prefetch else None)
        return np.asarray(jax.device_get(logits), np.float32), state

    def _decode_chunk_fn(self, b: int, n_chunks: int, C: int,
                         n_steps: int):
        """Greedy multi-step decode in ONE dispatch: an outer scan over
        ``n_steps`` feeds argmax back on device, re-streaming the cold tier
        per step (attention must re-read it; that is the exact-attention
        floor) but paying the host/tunnel round trip once per chunk instead
        of once per token (~1 s/step on the axon tunnel)."""
        key = ("chunk", b, n_chunks, C, n_steps)
        if key in self._decode_fns:
            return self._decode_fns[key]
        cfg, kb = self.cfg, self.k_block
        dev = _dev_sharding()

        prefetch = self.prefetch

        def fn(params, tok, hot_kv_tree, hot_offset, hot_valid, cold_k,
               cold_s, cold_valid, cos, sin, dev0_k, dev0_s):
            mdl = params["model"]

            def step(carry, _):
                tok, hot_kv, off = carry
                x = embedding(mdl["embed_tokens"], tok).astype(
                    jnp.dtype(cfg.dtype))
                pos = C + off
                cos_t = lax.dynamic_slice_in_dim(cos, pos, 1, axis=1)
                sin_t = lax.dynamic_slice_in_dim(sin, pos, 1, axis=1)
                if cos_t.shape[0] == 1 and x.shape[0] > 1:
                    cos_t = jnp.broadcast_to(
                        cos_t, (x.shape[0],) + cos_t.shape[1:])
                    sin_t = jnp.broadcast_to(
                        sin_t, (x.shape[0],) + sin_t.shape[1:])
                x, hot_kv, _ = _tiered_layers(
                    cfg, mdl["layers"], x, hot_kv, cold_k, cold_s,
                    cold_valid, cos_t, sin_t, off, hot_valid,
                    k_block=kb, dev_sharding=dev,
                    dev0=(dev0_k, dev0_s) if prefetch else None,
                )
                x = rms_norm(x[:, -1:], mdl["norm"]["weight"],
                             cfg.rms_norm_eps)
                logits = dense(params["lm_head"], x)[..., : cfg.vocab_size]
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
                return (nxt, hot_kv, off + 1), nxt[:, 0]

            (tok_f, hot_kv, off_f), toks = lax.scan(
                step, (tok, KVCache(*hot_kv_tree), hot_offset), None,
                length=n_steps,
            )
            return toks, tuple(hot_kv)

        self._decode_fns[key] = jax.jit(fn, donate_argnums=(2,))
        return self._decode_fns[key]

    def decode_chunk(self, state: TieredState, tok, n_steps: int):
        """Greedy-decode ``n_steps`` tokens in one dispatch.

        Returns ((n_steps, B) int32 tokens, state)."""
        fn = self._decode_chunk_fn(state.hot.valid.shape[0],
                                   len(state.cold_k), state.C, n_steps)
        toks, hot_kv = fn(
            self.lm.params, jnp.asarray(tok), tuple(state.hot.kv),
            state.hot.offset, state.hot.valid, tuple(state.cold_k),
            tuple(state.cold_s), state.cold_valid, state.cos, state.sin,
            tuple(state.dev0_k or ()), tuple(state.dev0_s or ()),
        )
        state.hot = state.hot._replace(
            kv=KVCache(*hot_kv), offset=state.hot.offset + n_steps
        )
        return np.asarray(jax.device_get(toks)), state

    def _spec_chunk_fn(self, b: int, n_chunks: int, C: int, n_iters: int,
                       k_draft: int, sampler=None):
        """Speculative multi-iteration decode in ONE dispatch.

        The tiered cost model is dominated by the cold-tier PCIe stream:
        every attention pass re-reads the whole pinned-host cache, so a
        greedy step pays ~window-bytes per TOKEN.  Verifying K prompt-lookup
        drafts in one lq = K+1 pass (engine/speculative.py) re-reads the
        cold tier ONCE for up to K+1 emitted tokens — the stream cost per
        token drops by the acceptance-weighted chunk length.  Greedy-exact
        when ``sampler`` is None: argmax-match acceptance keeps the emitted
        stream bit-identical to per-step tiered decode (tests/test_tiered.py).
        ``sampler`` = (temperature, top_p, top_k, min_p): rejection-sampled
        verification (engine/speculative.py:verify_sampled) — each emitted
        token is distributed exactly as vanilla sampling from the filtered
        target, so the 128K tiered path gets sampled decode at spec speed.

        Every scan iteration steps unconditionally — no ``lax.cond`` around
        the layer pass.  On the real TPU a conditional body breaks XLA's
        memory-space propagation for the pinned_host scan-xs (layout
        assignment then wants a transposed cross-memory-space copy, which
        async-start rejects); the caller bounds iteration count host-side
        instead and trims overshoot (spec_decode).
        """
        key = ("spec", b, n_chunks, C, n_iters, k_draft, sampler)
        if key in self._decode_fns:
            return self._decode_fns[key]
        from .speculative import propose_drafts, verify_sampled

        cfg, kb = self.cfg, self.k_block
        dev = _dev_sharding()
        lq = k_draft + 1

        prefetch = self.prefetch

        def fn(params, tok, hot_kv_tree, hot_offset, hot_valid, cold_k,
               cold_s, cold_valid, cos, sin, buf, dev0_k, dev0_s, rng):
            mdl = params["model"]
            valid_full = jnp.concatenate([cold_valid, hot_valid], axis=1)

            def step(carry, _):
                tok, hot_kv, off, hist, rng = carry
                rng, rng_step = jax.random.split(rng)
                off_abs = C + off
                draft = propose_drafts(hist, valid_full, tok, off_abs,
                                       k_draft)
                ids = jnp.concatenate([tok, draft], axis=1)  # (B, lq)
                hist = lax.dynamic_update_slice(hist, ids, (0, off_abs))
                x = embedding(mdl["embed_tokens"], ids).astype(
                    jnp.dtype(cfg.dtype))
                cos_t = lax.dynamic_slice_in_dim(cos, off_abs, lq, axis=1)
                sin_t = lax.dynamic_slice_in_dim(sin, off_abs, lq, axis=1)
                if cos_t.shape[0] == 1 and x.shape[0] > 1:
                    cos_t = jnp.broadcast_to(
                        cos_t, (x.shape[0],) + cos_t.shape[1:])
                    sin_t = jnp.broadcast_to(
                        sin_t, (x.shape[0],) + sin_t.shape[1:])
                x, hot_kv, _ = _tiered_layers(
                    cfg, mdl["layers"], x, hot_kv, cold_k, cold_s,
                    cold_valid, cos_t, sin_t, off, hot_valid,
                    k_block=kb, dev_sharding=dev,
                    dev0=(dev0_k, dev0_s) if prefetch else None,
                )
                x = rms_norm(x, mdl["norm"]["weight"], cfg.rms_norm_eps)
                logits = dense(params["lm_head"], x)[..., : cfg.vocab_size]
                if sampler is None:
                    out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    match = (draft == out[:, :-1]).astype(jnp.int32)
                    acc = jnp.cumprod(match, axis=1).sum(axis=1)  # (B,)
                else:
                    out, n_emit_v = verify_sampled(
                        logits.astype(jnp.float32), draft, rng_step, *sampler
                    )
                    acc = n_emit_v - 1
                n_emit = acc[0] + 1
                nxt = jnp.take_along_axis(out, acc[:, None], axis=1)
                return (nxt, hot_kv, off + n_emit, hist, rng), (out, n_emit)

            (tok_f, hot_kv, off_f, buf_f, _), (toks, n_emits) = lax.scan(
                step,
                (tok, KVCache(*hot_kv_tree), hot_offset, buf, rng),
                None, length=n_iters,
            )
            return toks, n_emits, off_f, tuple(hot_kv), buf_f

        self._decode_fns[key] = jax.jit(fn, donate_argnums=(2, 10))
        return self._decode_fns[key]

    def spec_generate(self, dict_input: dict, max_tokens: int,
                      eos_id: Optional[int] = None, k_draft: int = 7,
                      n_iters: int = 8, temperature: float = 0.0,
                      top_p: float = 1.0, top_k: int = 0,
                      min_p: float = 0.0, seed: int = 0) -> List[int]:
        """Tiered generation with prompt-lookup speculation (B=1).

        Greedy by default — bit-identical to :meth:`generate` (argmax-match
        acceptance); up to ``k_draft + 1`` tokens share one cold-tier PCIe
        stream.  ``temperature > 0`` switches to rejection-sampled
        verification (engine/speculative.py:verify_sampled): each emitted
        token is distributed exactly as vanilla sampling from the filtered
        target, so the 128K path composes sampling with spec speed.
        ``n_iters`` verify iterations run per device dispatch (the scan
        self-limits once the token budget or hot window is exhausted).
        """
        from .speculative import init_token_buffer

        if max_tokens + k_draft + 1 > self.hot_window:
            raise ValueError(
                f"max_tokens {max_tokens} + k_draft {k_draft} + 1 exceeds "
                f"the hot window {self.hot_window}; raise hot= at "
                f"construction"
            )
        logits, state = self.prefill(dict_input)
        if temperature > 0:
            from .engine import filter_sample_logits

            f = filter_sample_logits(
                jnp.asarray(logits, jnp.float32), temperature, top_p,
                top_k, min_p,
            )
            tok = int(jax.random.categorical(
                jax.random.fold_in(jax.random.PRNGKey(seed), 0), f, axis=-1
            )[0])
        else:
            tok = int(np.argmax(logits[0]))
        ids_p, _, _, l_pad = _pad_to_chunks(dict_input, self.pc)
        buf = init_token_buffer(ids_p, state.window)
        out, _ = self.spec_decode(
            state, tok, buf, max_tokens, eos_id=eos_id, k_draft=k_draft,
            n_iters=n_iters, temperature=temperature, top_p=top_p,
            top_k=top_k, min_p=min_p, seed=seed,
        )
        return out

    def spec_decode(self, state: TieredState, tok: int, buf, max_tokens: int,
                    eos_id: Optional[int] = None, k_draft: int = 7,
                    n_iters: int = 8, temperature: float = 0.0,
                    top_p: float = 1.0, top_k: int = 0, min_p: float = 0.0,
                    seed: int = 0):
        """The decode half of :meth:`spec_generate` (bench-friendly split:
        prefill once, time this).  ``tok`` is the first emitted token (from
        the prefill logits), ``buf`` the window-aligned token history
        (engine/speculative.py:init_token_buffer).  Returns
        (emitted tokens incl. ``tok``, updated state).

        Iteration count is bounded HOST-side (the jitted scan body has no
        conditional — see _spec_chunk_fn): each dispatch runs ``n_use``
        unconditional verify iterations where ``n_use`` fits the remaining
        hot window at the worst case (lq entries per iteration).  A
        dispatch may overshoot ``max_tokens``/``eos_id`` by at most one
        dispatch's worth of tokens; the overshoot is valid greedy
        continuation written to the hot window and simply trimmed here.
        At most two program sizes compile: ``n_iters`` and the final
        partial dispatch's remainder."""
        from .speculative import init_token_buffer  # noqa: F401 (doc ref)

        sampler = (
            (float(temperature), float(top_p), int(top_k), float(min_p))
            if temperature > 0 else None
        )
        rng = jax.random.PRNGKey(seed)
        out = [tok]
        b, nc = state.cold_valid.shape[0], len(state.cold_k)
        lq = k_draft + 1
        dispatch_i = 0
        while len(out) < max_tokens and (eos_id is None or tok != eos_id):
            off_now = int(jax.device_get(state.hot.offset))
            room = (self.hot_window - off_now) // lq  # iters that fit hot
            if room <= 0:
                break  # hot window exhausted before the budget
            # not capped by the remaining budget: overshoot is trimmed, and
            # keeping n_use off the budget means at most TWO program sizes
            # ever compile (n_iters + a room-capped final dispatch)
            n_use = min(n_iters, room)
            fn = self._spec_chunk_fn(b, nc, state.C, n_use, k_draft,
                                     sampler=sampler)
            dispatch_i += 1
            toks, n_emits, off, hot_kv, buf = fn(
                self.lm.params, jnp.asarray([[tok]], jnp.int32),
                tuple(state.hot.kv), state.hot.offset, state.hot.valid,
                tuple(state.cold_k), tuple(state.cold_s), state.cold_valid,
                state.cos, state.sin, buf,
                tuple(state.dev0_k or ()), tuple(state.dev0_s or ()),
                jax.random.fold_in(rng, dispatch_i),
            )
            state.hot = state.hot._replace(kv=KVCache(*hot_kv), offset=off)
            toks = np.asarray(jax.device_get(toks))      # (n_use, B, lq)
            n_emits = np.asarray(jax.device_get(n_emits))  # (n_use,)
            for it in range(toks.shape[0]):
                n = int(n_emits[it])
                for t in toks[it, 0, :n].tolist():
                    out.append(int(t))
                    tok = int(t)
                    if (eos_id is not None and tok == eos_id) or \
                            len(out) >= max_tokens:
                        return out[:max_tokens], state
        return out[:max_tokens], state

    def _consolidate_fn(self, n_in: int):
        """Jitted host-to-host concat of ``n_in`` cold chunks.

        A ``lax.scan`` over the layer axis streams one layer's slices
        host->device, concatenates on the column axis, and the stacked ys
        go straight back to ``pinned_host`` via ``out_shardings`` (the
        same streaming pattern prefill eviction uses).  Peak HBM is a few
        layer slices; every byte moves over the machine-LOCAL PCIe link.
        The old numpy path (``np.asarray`` + re-``device_put``) pulled the
        whole cold tier through the remote-dispatch tunnel — GBs over the
        network — which is why the r4 group=8 attempt appeared to hang.
        """
        key = ("consolidate", n_in)
        if key in self._decode_fns:
            return self._decode_fns[key]
        dev = _dev_sharding()
        host = _host_sharding()

        def fn(*chunks):
            def body(_, slices):
                return None, jnp.concatenate(
                    [jax.device_put(s, dev) for s in slices], axis=-1)
            return lax.scan(body, None, chunks)[1]

        if jax.default_backend() == "tpu":
            jfn = jax.jit(fn, out_shardings=host)
        else:
            jfn_dev = jax.jit(fn)
            jfn = lambda *a: jax.device_put(jfn_dev(*a), host)
        self._decode_fns[key] = jfn
        return jfn

    def consolidate(self, state: TieredState, group: int) -> TieredState:
        """Merge cold chunks in groups of ``group`` along the column axis.

        Each decode layer pass then issues 2 host->device transfers per
        GROUP instead of 2 per chunk — same bytes, ``group``x fewer
        transfers, so per-transfer fixed overhead (and per-slice host work)
        amortizes.  One-time cost: one PCIe round trip of the cold tier
        (see ``_consolidate_fn``).  Numerics are unchanged (the per-chunk
        stats loop sees identical columns in identical order;
        tests/test_tiered.py).
        """
        n = len(state.cold_k)
        if group <= 1 or n <= 1:
            return state
        if n % group:
            raise ValueError(f"{n} cold chunks do not group by {group}")
        jfn = self._consolidate_fn(group)
        new_k, new_s = [], []
        for i in range(0, n, group):
            new_k.append(jfn(*state.cold_k[i : i + group]))
            new_s.append(jfn(*state.cold_s[i : i + group]))
        jax.block_until_ready((new_k, new_s))
        state.cold_k, state.cold_s = new_k, new_s
        if state.prefetch:  # layer-0 device slices merge the same way
            state.dev0_k = [
                jnp.concatenate(state.dev0_k[i : i + group], axis=-1)
                for i in range(0, n, group)]
            state.dev0_s = [
                jnp.concatenate(state.dev0_s[i : i + group], axis=-1)
                for i in range(0, n, group)]
        state.PC = state.PC * group
        return state

    def decode_step(self, state: TieredState, tok) -> Tuple[np.ndarray, TieredState]:
        """One greedy-ready step: (B,1) token ids -> (B, V) f32 logits."""
        fn = self._decode_fn(state.hot.valid.shape[0], len(state.cold_k),
                             state.C)
        logits, hot_kv = fn(
            self.lm.params, jnp.asarray(tok), tuple(state.hot.kv),
            state.hot.offset, state.hot.valid, tuple(state.cold_k),
            tuple(state.cold_s), state.cold_valid, state.cos, state.sin,
            tuple(state.dev0_k or ()), tuple(state.dev0_s or ()),
        )
        state.hot = state.hot._replace(
            kv=KVCache(*hot_kv), offset=state.hot.offset + 1
        )
        return logits, state

    def generate(self, dict_input: dict, max_tokens: int,
                 eos_id: Optional[int] = None,
                 chunk_steps: Optional[int] = None) -> List[int]:
        """Greedy tiered generation; returns emitted token ids (B=1).

        ``chunk_steps`` (env ``PHI3V_TPU_TIERED_CHUNK``, default 4) decodes
        that many tokens per device dispatch — each step still re-streams
        the cold tier (exact attention), but the host/tunnel round trip
        amortizes across the chunk.
        """
        import os

        if max_tokens > self.hot_window:
            raise ValueError(
                f"max_tokens {max_tokens} exceeds the hot window "
                f"{self.hot_window}; raise hot= at construction"
            )
        if chunk_steps is None:
            chunk_steps = int(os.environ.get("PHI3V_TPU_TIERED_CHUNK", "4"))
        logits, state = self.prefill(dict_input)
        tok = int(np.argmax(logits[0]))
        out = [tok]
        while len(out) < max_tokens and (eos_id is None or tok != eos_id):
            n = min(max(chunk_steps, 1), max_tokens - len(out))
            toks, state = self.decode_chunk(
                state, np.array([[tok]], np.int32), n
            )
            for t in toks[:, 0].tolist():
                out.append(int(t))
                tok = int(t)
                if eos_id is not None and tok == eos_id:
                    break
        return out
