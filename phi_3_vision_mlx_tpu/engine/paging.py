"""Paged KV cache for continuous batching.

:class:`~.batching.BatchEngine` reserves a full ``window`` of cache per slot
— simple, but short requests strand most of their reservation.  This module
adds the paged refinement: one shared **page pool** ``(nl, P, KV, page, D)``
plus a per-slot **page table**; pages are handed out on demand (prompt pages
at admission, one page at a time as decode crosses page boundaries) and
returned to the free list when a request completes.  Total cache memory is
set by the pool size, not ``slots x window`` — e.g. ``pool_pages`` at half
the dense reservation serves the same slot count when requests average under
half the window.

Static shapes throughout (TPU-first): the page table is a fixed
``(slots, window // page)`` int32 array; unallocated entries hold the
sentinel ``P`` and writes through them are dropped (`mode="drop"`), so a
freed slot's stale table can never corrupt a reallocated page.  The decode
step gathers each slot's pages into its logical window view; a Pallas
refinement would instead feed the page table to the decode-attention
kernel's BlockSpec index map (scalar prefetch) and skip the gather.

Serves both the dense bf16 cache and the packed int4/int8-quantized cache;
greedy decoding (sampling composes the same way as the slot engine).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.config import ModelConfig
from ..models import phi3
from ..ops.attention import masked_attention
from ..ops.linear import dense, embedding
from ..ops.norms import rms_norm
from ..ops.rope import apply_rotary, su_rope_tables
from .batching import BatchEngine, _Request


class PagedState:
    """Device-side pool + tables (functional; replaced each step)."""

    def __init__(self, pool_k, pool_v, page_tables, offsets, pads, valid, cos,
                 sin, tokens, buf=None):
        self.pool_k = pool_k  # (nl, P, KV, page, D)
        self.pool_v = pool_v
        self.page_tables = page_tables  # (S, max_pages) int32; P = unallocated
        self.offsets = offsets
        self.pads = pads
        self.valid = valid  # (S, W) logical key validity
        self.cos = cos
        self.sin = sin
        self.tokens = tokens
        # (S, W) token history for the speculative draft proposer
        # (engine/speculative.py) — performance metadata, never correctness.
        self.buf = (
            buf if buf is not None else jnp.zeros(valid.shape, jnp.int32)
        )

    def tree(self):
        return (self.pool_k, self.pool_v, self.page_tables, self.offsets,
                self.pads, self.valid, self.cos, self.sin, self.tokens,
                self.buf)

    @classmethod
    def from_tree(cls, t):
        return cls(*t)


def _init_paged(cfg: ModelConfig, slots: int, window: int, page: int,
                pool_pages: int, dtype):
    nl, kvh, d = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    cos, sin = su_rope_tables(cfg, window)
    if cfg.use_quantized_cache:
        # packed quantized page layout (engine/state.py): pool_k = uint8
        # payload pages (rows x pg, L last), pool_v = fused scale planes.
        g = cfg.kv_quant.group_size
        groups = max(1, d // g)
        rows = d if cfg.kv_quant.bits == 4 else 2 * d
        return PagedState(
            pool_k=jnp.zeros((nl, pool_pages, kvh, rows, page), jnp.uint8),
            pool_v=jnp.zeros((nl, pool_pages, kvh, 4 * groups, page), jnp.bfloat16),
            page_tables=jnp.full((slots, window // page), pool_pages, jnp.int32),
            offsets=jnp.zeros((slots,), jnp.int32),
            pads=jnp.zeros((slots,), jnp.int32),
            valid=jnp.zeros((slots, window), bool),
            cos=jnp.broadcast_to(cos, (slots,) + cos.shape[1:]),
            sin=jnp.broadcast_to(sin, (slots,) + sin.shape[1:]),
            tokens=jnp.zeros((slots,), jnp.int32),
        )
    return PagedState(
        pool_k=jnp.zeros((nl, pool_pages, kvh, page, d), dtype),
        pool_v=jnp.zeros((nl, pool_pages, kvh, page, d), dtype),
        page_tables=jnp.full((slots, window // page), pool_pages, jnp.int32),
        offsets=jnp.zeros((slots,), jnp.int32),
        pads=jnp.zeros((slots,), jnp.int32),
        valid=jnp.zeros((slots, window), bool),
        cos=jnp.broadcast_to(cos, (slots,) + cos.shape[1:]),
        sin=jnp.broadcast_to(sin, (slots,) + sin.shape[1:]),
        tokens=jnp.zeros((slots,), jnp.int32),
    )


def _use_paged_kernel() -> bool:
    import os

    if os.environ.get("PHI3V_TPU_PAGED_KERNEL", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _paged_decode_chunk(params, cfg: ModelConfig, st: PagedState, active,
                        page: int, n_steps: int, temps=None, top_ps=None,
                        top_ks=None, min_ps=None, key=None, eos_id: int = 0):
    """``n_steps`` steps for all slots over the paged pool, one dispatch.
    The host pre-allocates every page the chunk can touch
    (PagedBatchEngine.step), so in-chunk page crossings are just table
    lookups.  Sampling/stats semantics match batching._decode_chunk.
    Returns (tokens, maxlp, eoslp (each (n_steps, S)), new state)."""
    mdl = params["model"]
    s, w = st.valid.shape
    mp = w // page
    pool_pages = st.pool_k.shape[1]
    light, heavy = phi3._partition_heavy(mdl["layers"])
    key_pos = jnp.arange(w)
    slot_ids = jnp.arange(s)
    scale = cfg.head_dim**-0.5
    quantized = cfg.use_quantized_cache
    # gather ids fixed for the whole chunk (pages pre-allocated by the host)
    gather_pt = jnp.minimum(st.page_tables, pool_pages - 1)  # (S, mp)

    def one_step(carry, step_i):
        tok, offsets, valid, pk, pv, buf = carry
        buf = jnp.where(
            active[:, None], buf.at[slot_ids, offsets].set(tok, mode="drop"),
            buf,
        )
        x = embedding(mdl["embed_tokens"], tok[:, None]).astype(
            jnp.dtype(cfg.dtype)
        )
        idx = (offsets - st.pads)[:, None, None]
        cos = jnp.take_along_axis(
            st.cos, jnp.broadcast_to(idx, (s, 1, st.cos.shape[-1])), 1
        )
        sin = jnp.take_along_axis(
            st.sin, jnp.broadcast_to(idx, (s, 1, st.sin.shape[-1])), 1
        )
        fresh = key_pos[None, :] == offsets[:, None]
        allowed = ((key_pos[None, :] <= offsets[:, None]) & valid) | fresh
        allowed = allowed[:, None, None, :]

        write_page_idx = offsets // page  # (S,)
        write_pid = jnp.take_along_axis(
            st.page_tables, jnp.minimum(write_page_idx, mp - 1)[:, None], 1
        )[:, 0]
        write_pid = jnp.where(active, write_pid, pool_pages)  # sentinel drop
        write_col = offsets % page

        def body(carry, xs):
            y, pk, pv = carry
            lp, li = xs
            h = rms_norm(y, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
            qkv = phi3._dense_at(lp, heavy, ("self_attn", "qkv_proj"), h, li)
            q, k, v = phi3._qkv_split(cfg, qkv)
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
            if quantized:
                from ..engine.state import quantize_chunk

                entries = quantize_chunk(k, v, cfg.kv_quant, True)
                pk = pk.at[li, write_pid, :, :, write_col].set(
                    entries.k[..., 0], mode="drop"
                )
                pv = pv.at[li, write_pid, :, :, write_col].set(
                    entries.k_scales[..., 0].astype(pv.dtype), mode="drop"
                )
            else:
                pk = pk.at[li, write_pid, :, write_col].set(
                    k[:, :, 0, :].astype(pk.dtype), mode="drop"
                )
                pv = pv.at[li, write_pid, :, write_col].set(
                    v[:, :, 0, :].astype(pv.dtype), mode="drop"
                )
            layer_k = lax.dynamic_index_in_dim(pk, li, 0, keepdims=False)
            layer_v = lax.dynamic_index_in_dim(pv, li, 0, keepdims=False)
            if quantized and _use_paged_kernel() and cfg.kv_quant.bits == 4:
                from ..ops.kernels.kv_attention import (
                    d_perm,
                    d_unperm,
                    paged_quantized_kv_attention,
                )

                groups = layer_v.shape[2] // 4
                perm = d_perm(q.shape[-1], groups)
                o_p = paged_quantized_kv_attention(
                    q[..., perm], layer_k, layer_v, st.page_tables, valid,
                    offsets, scale=scale,
                )
                o = o_p[..., d_unperm(q.shape[-1], groups)].astype(y.dtype)
            elif quantized:
                from ..engine.state import LayerKV, read_kv

                kq = layer_k[gather_pt]  # (S, mp, KV, rows, pg)
                sq = layer_v[gather_pt]
                kq = kq.transpose(0, 2, 3, 1, 4).reshape(
                    s, kq.shape[2], kq.shape[3], mp * page
                )
                sq = sq.transpose(0, 2, 3, 1, 4).reshape(
                    s, sq.shape[2], sq.shape[3], mp * page
                )
                kc, vc = read_kv(
                    LayerKV(k=kq, k_scales=sq), y.dtype, cfg.kv_quant.bits
                )
                o = masked_attention(q, kc, vc, allowed, scale)
            elif _use_paged_kernel():
                from ..ops.kernels.kv_attention import paged_kv_attention

                o = paged_kv_attention(
                    q, layer_k, layer_v, st.page_tables, valid, offsets,
                    scale=scale,
                ).astype(y.dtype)
            else:
                kc = layer_k[gather_pt]  # (S, mp, KV, pg, D)
                vc = layer_v[gather_pt]
                kc = kc.transpose(0, 2, 1, 3, 4).reshape(
                    s, kc.shape[2], mp * page, -1
                )
                vc = vc.transpose(0, 2, 1, 3, 4).reshape(
                    s, vc.shape[2], mp * page, -1
                )
                o = masked_attention(
                    q, kc.astype(y.dtype), vc.astype(y.dtype), allowed, scale
                )
            o = o.transpose(0, 2, 1, 3).reshape(s, 1, -1)
            y = y + phi3._dense_at(
                lp, heavy, ("self_attn", "o_proj"), o, li
            ).astype(y.dtype)
            hh = rms_norm(y, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
            gate_up = phi3._dense_at(lp, heavy, ("mlp", "gate_up_proj"), hh, li)
            gate, up = jnp.split(gate_up, 2, axis=-1)
            ff = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            y = y + phi3._dense_at(
                lp, heavy, ("mlp", "down_proj"), ff, li
            ).astype(y.dtype)
            return (y, pk, pv), None

        (x, pk, pv), _ = lax.scan(
            body, (x, pk, pv), (light, jnp.arange(cfg.num_hidden_layers))
        )
        x = rms_norm(x, mdl["norm"]["weight"], cfg.rms_norm_eps)
        logits = dense(params["lm_head"], x)[..., : cfg.vocab_size]
        lg = logits[:, -1, :].astype(jnp.float32)
        lp = jax.nn.log_softmax(lg, axis=-1)
        if temps is None:
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        else:
            from .engine import sample_token_rows

            nxt = sample_token_rows(
                lg, jax.random.fold_in(key, step_i), temps, top_ps,
                top_ks=top_ks, min_ps=min_ps,
            )

        new_valid = jnp.where(
            active[:, None], valid.at[slot_ids, offsets].set(True), valid
        )
        new_offsets = jnp.where(active, offsets + 1, offsets)
        new_tok = jnp.where(active, nxt, tok)
        stats = (nxt, lp.max(axis=-1), lp[:, eos_id])
        return (new_tok, new_offsets, new_valid, pk, pv, buf), stats

    carry0 = (st.tokens, st.offsets, st.valid, st.pool_k, st.pool_v, st.buf)
    (tok_f, off_f, valid_f, pk, pv, buf_f), (toks, maxlp, eoslp) = lax.scan(
        one_step, carry0, jnp.arange(n_steps)
    )
    return toks, maxlp, eoslp, PagedState(
        pool_k=pk, pool_v=pv, page_tables=st.page_tables, offsets=off_f,
        pads=st.pads, valid=valid_f, cos=st.cos, sin=st.sin, tokens=tok_f,
        buf=buf_f,
    )


def _paged_spec_decode_chunk(params, cfg: ModelConfig, st: PagedState, active,
                             page: int, n_passes: int, k_draft: int,
                             eos_id: int = 0, temps=None, top_ps=None,
                             top_ks=None, min_ps=None, key=None,
                             spec_ok=None):
    """``n_passes`` speculative verify passes over the paged pool — the
    paged counterpart of batching._spec_decode_chunk.  The host pre-maps
    every page a worst-case chunk can touch (n_passes * (K+1) columns per
    slot, PagedBatchEngine.step), so multi-column writes are table lookups;
    the paged Pallas kernels' fresh-region mask exposes the pass's earlier
    draft columns causally (ops/kernels/kv_attention.py).

    ``spec_ok``: optional device (S,) bool — UNIFORM-dispatch mode, same
    semantics as batching._spec_decode_chunk: rows with ``spec_ok`` False
    or no window room for a worst-case pass run as padded vanilla steps
    (forced-reject, one committed token) inside the same (S, K+1) dispatch,
    writing only in-window columns (worst-case reservation already mapped
    every in-window page).  One compiled shape per run keeps greedy streams
    bit-reproducible on TPU; ``spec_ok=None`` is the legacy tail-switch
    behavior.

    Exactness note (applies to both slot engines): emitted tokens are always
    the model's own greedy argmax over the cache it wrote (acceptance
    compares draft vs argmax within one pass), and streams are bit-identical
    to the vanilla engine on CPU and for the dense cache on TPU.  With the
    int4-QUANTIZED cache on TPU, XLA tiles fp reductions differently for
    (S, 1, E) vs (S, K+1, E) shapes once S*(K+1) > 8 rows; the last-bit k/v
    differences can flip int4 quantization boundaries, so the spec stream
    may drift from vanilla's at argmax near-ties — the same noise class as
    cache quantization itself.  (Single-stream speculation pads both paths
    to the same 8-row tile and stays bit-exact; uniform dispatch extends
    the same idea to the slot engines.)

    Measured on-chip (experiments/spec_serving_exact_check.json, full model
    size, int4 cache, 4 slots x 96 tokens): the accepting uniform-spec
    engine and its padded-vanilla baseline (``spec_accept=False`` — one
    committed token per pass through the IDENTICAL compiled (S, K+1) fn)
    emit bit-identical greedy streams, i.e. in-pass accepted rows equal the
    later row-0 recomputations.  The legacy lq=1 engine drifts from both at
    near-ties (first diffs at tokens 1-19 on random weights), as documented
    above.  Worst-case cost of the uniform shape — zero acceptance, so every
    pass commits 1 token through the padded dispatch — is 0.68x the legacy
    lq=1 rate; any realistic acceptance recovers it (2 tok/pass is already
    1.35x)."""
    from .speculative import propose_drafts

    mdl = params["model"]
    s, w = st.valid.shape
    mp = w // page
    pool_pages = st.pool_k.shape[1]
    light, heavy = phi3._partition_heavy(mdl["layers"])
    key_pos = jnp.arange(w)
    slot_ids = jnp.arange(s)
    scale = cfg.head_dim**-0.5
    quantized = cfg.use_quantized_cache
    uniform = spec_ok is not None
    kk1 = k_draft + 1
    ar = jnp.arange(kk1)
    gather_pt = jnp.minimum(st.page_tables, pool_pages - 1)  # (S, mp)

    if key is None:
        key = jax.random.PRNGKey(0)

    def one_pass(carry, _):
        tok, offsets, valid, pk, pv, buf, k_it = carry
        if uniform:
            live = active & (offsets + 1 <= w)
            can_spec = live & spec_ok & (offsets + kk1 <= w)
        else:
            live = active & (offsets + kk1 <= w)
            can_spec = live
        draft = propose_drafts(buf, valid, tok[:, None], offsets, k_draft)
        ids = jnp.concatenate([tok[:, None], draft], axis=1)  # (S, kk1)
        wpos = offsets[:, None] + ar[None, :]  # (S, kk1) cache columns
        wr_ok = (live[:, None] & (wpos < w)) if uniform else live[:, None]
        buf = buf.at[
            slot_ids[:, None], jnp.where(wr_ok, wpos, w)
        ].set(ids, mode="drop")
        x = embedding(mdl["embed_tokens"], ids).astype(jnp.dtype(cfg.dtype))

        pidx = jnp.clip((offsets - st.pads)[:, None] + ar[None, :], 0, w - 1)
        cos = jnp.take_along_axis(
            st.cos, jnp.broadcast_to(pidx[:, :, None], (s, kk1, st.cos.shape[-1])), 1
        )
        sin = jnp.take_along_axis(
            st.sin, jnp.broadcast_to(pidx[:, :, None], (s, kk1, st.sin.shape[-1])), 1
        )

        fresh = (key_pos[None, None, :] >= offsets[:, None, None]) & (
            key_pos[None, None, :] <= wpos[:, :, None]
        )
        allowed = (
            (key_pos[None, None, :] <= wpos[:, :, None]) & valid[:, None, :]
        ) | fresh
        allowed = allowed[:, None]  # (S, 1, kk1, W)

        # page-table write targets per (slot, draft position)
        wpage = jnp.take_along_axis(
            st.page_tables, jnp.minimum(wpos // page, mp - 1), 1
        )  # (S, kk1)
        wpid = jnp.where(wr_ok, wpage, pool_pages)  # sentinel drop
        wcol = wpos % page

        def body(carry, xs):
            y, pk, pv = carry
            lp, li = xs
            h = rms_norm(y, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
            qkv = phi3._dense_at(lp, heavy, ("self_attn", "qkv_proj"), h, li)
            q, k, v = phi3._qkv_split(cfg, qkv)
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
            if quantized:
                from ..engine.state import quantize_chunk

                entries = quantize_chunk(k, v, cfg.kv_quant, True)
                # payload (S, KV, rows, kk1) -> values (S, kk1, KV, rows)
                pk = pk.at[li, wpid, :, :, wcol].set(
                    entries.k.transpose(0, 3, 1, 2), mode="drop"
                )
                pv = pv.at[li, wpid, :, :, wcol].set(
                    entries.k_scales.transpose(0, 3, 1, 2).astype(pv.dtype),
                    mode="drop",
                )
            else:
                pk = pk.at[li, wpid, :, wcol].set(
                    k.transpose(0, 2, 1, 3).astype(pk.dtype), mode="drop"
                )
                pv = pv.at[li, wpid, :, wcol].set(
                    v.transpose(0, 2, 1, 3).astype(pv.dtype), mode="drop"
                )
            layer_k = lax.dynamic_index_in_dim(pk, li, 0, keepdims=False)
            layer_v = lax.dynamic_index_in_dim(pv, li, 0, keepdims=False)
            if quantized and _use_paged_kernel() and cfg.kv_quant.bits == 4:
                from ..ops.kernels.kv_attention import (
                    d_perm,
                    d_unperm,
                    paged_quantized_kv_attention,
                )

                groups = layer_v.shape[2] // 4
                perm = d_perm(q.shape[-1], groups)
                o_p = paged_quantized_kv_attention(
                    q[..., perm], layer_k, layer_v, st.page_tables, valid,
                    offsets, scale=scale,
                )
                o = o_p[..., d_unperm(q.shape[-1], groups)].astype(y.dtype)
            elif quantized:
                from ..engine.state import LayerKV, read_kv

                kq = layer_k[gather_pt]
                sq = layer_v[gather_pt]
                kq = kq.transpose(0, 2, 3, 1, 4).reshape(
                    s, kq.shape[2], kq.shape[3], mp * page
                )
                sq = sq.transpose(0, 2, 3, 1, 4).reshape(
                    s, sq.shape[2], sq.shape[3], mp * page
                )
                kc, vc = read_kv(
                    LayerKV(k=kq, k_scales=sq), y.dtype, cfg.kv_quant.bits
                )
                o = masked_attention(q, kc, vc, allowed, scale)
            elif _use_paged_kernel():
                from ..ops.kernels.kv_attention import paged_kv_attention

                o = paged_kv_attention(
                    q, layer_k, layer_v, st.page_tables, valid, offsets,
                    scale=scale,
                ).astype(y.dtype)
            else:
                kc = layer_k[gather_pt]
                vc = layer_v[gather_pt]
                kc = kc.transpose(0, 2, 1, 3, 4).reshape(
                    s, kc.shape[2], mp * page, -1
                )
                vc = vc.transpose(0, 2, 1, 3, 4).reshape(
                    s, vc.shape[2], mp * page, -1
                )
                o = masked_attention(
                    q, kc.astype(y.dtype), vc.astype(y.dtype), allowed, scale
                )
            o = o.transpose(0, 2, 1, 3).reshape(s, kk1, -1)
            y = y + phi3._dense_at(
                lp, heavy, ("self_attn", "o_proj"), o, li
            ).astype(y.dtype)
            hh = rms_norm(y, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
            gate_up = phi3._dense_at(lp, heavy, ("mlp", "gate_up_proj"), hh, li)
            gate, up = jnp.split(gate_up, 2, axis=-1)
            ff = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            y = y + phi3._dense_at(
                lp, heavy, ("mlp", "down_proj"), ff, li
            ).astype(y.dtype)
            return (y, pk, pv), None

        (x, pk, pv), _ = lax.scan(
            body, (x, pk, pv), (light, jnp.arange(cfg.num_hidden_layers))
        )
        x = rms_norm(x, mdl["norm"]["weight"], cfg.rms_norm_eps)
        logits = dense(params["lm_head"], x)[..., : cfg.vocab_size]
        lg = logits.astype(jnp.float32)  # (S, kk1, V)
        lp_all = jax.nn.log_softmax(lg, axis=-1)
        k_it, k_use = jax.random.split(k_it)
        if temps is None:
            out = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            match = (draft == out[:, :-1]).astype(jnp.int32)
            acc = jnp.cumprod(match, axis=1).sum(axis=1)
        else:
            from .speculative import verify_mixed_rows

            out, acc = verify_mixed_rows(
                lg, draft, k_use, temps, top_ps, top_ks, min_ps
            )
        if uniform:
            # Forced-reject rows commit one token (see
            # batching._spec_decode_chunk for the sampled-row rationale).
            acc = jnp.where(can_spec, acc, 0)
            if temps is not None:
                from .engine import sample_token_rows

                k_it, k_van = jax.random.split(k_it)
                van = sample_token_rows(
                    lg[:, 0], k_van, temps, top_ps, top_ks=top_ks,
                    min_ps=min_ps,
                )
                out = out.at[:, 0].set(
                    jnp.where(can_spec | (temps <= 0), out[:, 0], van)
                )
        n_emit = jnp.where(live, acc + 1, 0)

        new_valid = valid | (
            (key_pos[None, :] >= offsets[:, None])
            & (key_pos[None, :] < (offsets + n_emit)[:, None])
        )
        new_offsets = offsets + n_emit
        new_tok = jnp.where(live, out[slot_ids, acc], tok)
        stats = (out, lp_all.max(axis=-1), lp_all[..., eos_id], n_emit)
        return (new_tok, new_offsets, new_valid, pk, pv, buf, k_it), stats

    carry0 = (st.tokens, st.offsets, st.valid, st.pool_k, st.pool_v, st.buf,
              key)
    (tok_f, off_f, valid_f, pk, pv, buf_f, _), (toks, maxlp, eoslp, n_emits) = (
        lax.scan(one_pass, carry0, jnp.arange(n_passes))
    )
    return toks, maxlp, eoslp, n_emits, PagedState(
        pool_k=pk, pool_v=pv, page_tables=st.page_tables, offsets=off_f,
        pads=st.pads, valid=valid_f, cos=st.cos, sin=st.sin, tokens=tok_f,
        buf=buf_f,
    )


def _paged_adopt(cfg: ModelConfig, st: PagedState, slot, src_state, last_token,
                 l_pad: int, n_pads, page_ids, page: int, prompt_row=None,
                 src_row=0):
    """Scatter a prefilled request's cache columns into its allocated pages
    and install the slot's page-table row.

    page_ids: (max_pages,) int32 — ceil(l_pad/page) real ids then sentinel
    fill.  When ``page`` does not divide ``l_pad`` (page_size > the 64-token
    prompt bucket), the trailing partial page's unused columns are written as
    zeros — harmless, the validity bits mask them.
    """
    n_pages = -(-l_pad // page)
    l_full = n_pages * page
    row = lambda a: jax.lax.dynamic_index_in_dim(a, src_row, axis=1,
                                                 keepdims=False)
    if cfg.use_quantized_cache:
        # transposed quantized layout: (nl, KV, rows, W) -> per-page slices
        k_cols = row(src_state.kv.k)[:, :, :, :l_pad]
        s_cols = row(src_state.kv.k_scales)[:, :, :, :l_pad]
        nl, kvh, rows, _ = k_cols.shape

        def pages_of(cols):
            r = cols.shape[2]
            if l_full > l_pad:
                cols = jnp.pad(cols, ((0, 0),) * 3 + ((0, l_full - l_pad),))
            return cols.reshape(nl, kvh, r, n_pages, page).transpose(0, 3, 1, 2, 4)

        pool_k = st.pool_k.at[:, page_ids[:n_pages]].set(
            pages_of(k_cols).astype(st.pool_k.dtype)
        )
        pool_v = st.pool_v.at[:, page_ids[:n_pages]].set(
            pages_of(s_cols).astype(st.pool_v.dtype)
        )
    else:
        # (nl, KV, l_pad, D) -> (nl, n_pages, KV, page, D)
        k_cols = row(src_state.kv.k)[:, :, :l_pad]
        v_cols = row(src_state.kv.v)[:, :, :l_pad]
        nl, kvh, _, d = k_cols.shape

        def pages_of(cols):
            if l_full > l_pad:
                cols = jnp.pad(cols, ((0, 0), (0, 0), (0, l_full - l_pad), (0, 0)))
            return (
                cols.reshape(nl, kvh, n_pages, page, d)
                .transpose(0, 2, 1, 3, 4)
            )

        pool_k = st.pool_k.at[:, page_ids[:n_pages]].set(
            pages_of(k_cols).astype(st.pool_k.dtype)
        )
        pool_v = st.pool_v.at[:, page_ids[:n_pages]].set(
            pages_of(v_cols).astype(st.pool_v.dtype)
        )
    page_tables = st.page_tables.at[slot].set(page_ids)
    w = st.valid.shape[1]
    src_valid = jax.lax.dynamic_index_in_dim(src_state.valid, src_row, axis=0,
                                             keepdims=False)
    row_valid = jnp.concatenate(
        [src_valid[:l_pad], jnp.zeros((w - l_pad,), bool)]
    )
    valid = lax.dynamic_update_slice(st.valid, row_valid[None], (slot, 0))
    buf = st.buf
    if prompt_row is not None:
        buf = lax.dynamic_update_slice(
            buf, prompt_row.astype(jnp.int32)[None], (slot, 0)
        )
    return PagedState(
        pool_k=pool_k, pool_v=pool_v, page_tables=page_tables,
        offsets=st.offsets.at[slot].set(jnp.asarray(l_pad, jnp.int32)),
        pads=st.pads.at[slot].set(jnp.asarray(n_pads, jnp.int32)),
        valid=valid, cos=st.cos, sin=st.sin,
        tokens=st.tokens.at[slot].set(last_token),
        buf=buf,
    )


class PagedBatchEngine(BatchEngine):
    """Continuous batching over a shared page pool.

    ``pool_pages`` bounds total cache memory; default gives every slot its
    full window (no saving — size it to your traffic, e.g.
    ``slots * window // (2 * page_size)`` for 2x memory efficiency when
    requests average under half the window).

    Pool saturation preempts instead of raising: the youngest request is
    evicted (pages released) and transparently resumed by recompute when
    pages free up — the server survives overload at the cost of re-running
    the victim's prefill (vLLM's recompute-preemption policy).
    """

    def __init__(self, lm, processor, slots: int = 4, window: int = 1024,
                 page_size: int = 64, pool_pages: int = 0, seed: int = 0,
                 spec_k: int = 0, pipeline_depth: int = 1,
                 spec_accept: bool = True, spec_uniform=None):
        if 64 % page_size and page_size % 64:
            raise ValueError("page_size must divide or be a multiple of 64")
        if window % page_size:
            raise ValueError("window must be a multiple of page_size")
        self.page_size = page_size
        self.pool_pages = pool_pages or slots * (window // page_size)
        self._free_pages: List[int] = list(range(self.pool_pages))
        self._slot_pages: Dict[int, List[int]] = {}
        self.preempted: List[int] = []  # rids awaiting recompute resume
        super().__init__(lm, processor, slots=slots, window=window, seed=seed,
                         spec_k=spec_k, pipeline_depth=pipeline_depth,
                         spec_accept=spec_accept, spec_uniform=spec_uniform)

    def _init_state(self):
        return _init_paged(
            self.lm.cfg, self.slots, self.window, self.page_size,
            self.pool_pages, jnp.dtype(self.lm.cfg.dtype),
        )

    # -- page accounting ----------------------------------------------------

    def _alloc_pages(self, n: int) -> List[int]:
        if len(self._free_pages) < n:
            raise RuntimeError(
                f"page pool exhausted (need {n}, free {len(self._free_pages)})"
            )
        return [self._free_pages.pop() for _ in range(n)]

    def _release_slot(self, slot: int):
        self._free_pages.extend(self._slot_pages.pop(slot, []))

    # -- admission ----------------------------------------------------------

    def can_admit(self, prepared) -> bool:
        n_pages = -(-prepared.l_pad // self.page_size)
        if n_pages > self.pool_pages:
            # Structurally impossible: no amount of waiting frees more than
            # the whole pool.  Raise instead of returning False forever —
            # a scheduler looping on can_admit() would hang its caller.
            raise ValueError(
                f"prompt needs {n_pages} pages; the pool has only "
                f"{self.pool_pages} (pool_pages)"
            )
        # Preempted requests get resume priority: new admissions would
        # otherwise consume every freed slot/page and starve the queue.
        return (
            bool(self.free)
            and not self.preempted
            and n_pages <= len(self._free_pages)
        )

    def _adopt_prepared(self, p, slot: int) -> None:
        page = self.page_size
        mp = self.window // page
        l_pad = p.l_pad
        ids = self._alloc_pages(-(-l_pad // page))  # raises if pool is short
        self._slot_pages[slot] = list(ids)
        table_row = np.full((mp,), self.pool_pages, np.int32)
        table_row[: len(ids)] = ids

        key = (l_pad, p.src_state.valid.shape[0])
        if key not in self._adopt_fns:
            cfg = self.lm.cfg

            self._adopt_fns[key] = jax.jit(
                lambda t, slot, src, tok, pads, prow, ids_row, srow, _l=l_pad:
                _paged_adopt(
                    cfg, PagedState.from_tree(t), slot, src, tok, _l, pads,
                    prow, page, prompt_row=ids_row, src_row=srow,
                ).tree()
            )
        ids_row = np.zeros((l_pad,), np.int32)
        seed_ids = p.ids if p.ids is not None else p.prompt_ids
        ids_row[p.n_pads:] = np.maximum(np.asarray(seed_ids, np.int32), 0)
        from .batching import _first_arg

        self.state = PagedState.from_tree(
            self._adopt_fns[key](
                self.state.tree(), jnp.asarray(slot, jnp.int32), p.src_state,
                _first_arg(p), jnp.asarray(p.n_pads, jnp.int32),
                jnp.asarray(table_row), jnp.asarray(ids_row),
                jnp.asarray(p.src_row, jnp.int32),
            )
        )

    # -- preemption ---------------------------------------------------------

    def pending(self) -> bool:
        # _inflight matters: _project_completions can empty by_slot while
        # undone requests still owe tokens to uncollected pipelined chunks.
        return (bool(self.by_slot) or bool(self._inflight)
                or bool(self.preempted))

    def _preempt(self, req) -> None:
        """Evict a running request: release its pages, queue it for a
        recompute resume (vLLM-style).  Its page-table row goes stale but the
        slot is inactive — decode writes through it are sentinel-dropped."""
        slot = req.slot
        del self.by_slot[slot]
        self.free.append(slot)
        self._release_slot(slot)
        req.slot = -1
        self.preempted.append(req.rid)

    def _fail_request(self, req, message: str) -> None:
        req.error = message
        req.done = True

    def _resume_shape(self, req):
        """(l, l_pad, n_pages) of the recompute prefill for ``req``."""
        from .engine import round_up

        l = len(req.prompt_ids) + len(req.tokens) - 1
        l_pad = max(round_up(l, 64), 64)
        return l, l_pad, -(-l_pad // self.page_size)

    def resume_candidate(self):
        """Oldest preempted rid whose resume is feasible *right now*, or
        None.  Cheap (no device work) — run under the scheduler lock.
        Structurally impossible requests are failed and dropped here."""
        while self.preempted:
            rid = self.preempted[0]
            req = self.requests[rid]
            _, l_pad, n_pages = self._resume_shape(req)
            if l_pad >= self.window:
                self.preempted.pop(0)
                self._fail_request(
                    req, f"cannot resume: prompt+generated ({l_pad}) fills "
                         f"window {self.window}")
                continue
            if n_pages > self.pool_pages:
                self.preempted.pop(0)
                self._fail_request(
                    req, f"cannot resume: needs {n_pages} pages, pool has "
                         f"{self.pool_pages}")
                continue
            if not self.free or n_pages > len(self._free_pages):
                return None  # wait for running requests to release resources
            return rid
        return None

    def prepare_resume(self, rid):
        """The heavy recompute prefill for a preempted request — touches NO
        engine state, so a scheduler can run it OUTSIDE its lock while the
        pump keeps stepping active slots (same as admission's prepare()).

        Resume = re-prefill prompt + generated-so-far (the pending last
        token is re-seeded, not re-sampled), which reproduces the evicted
        cache exactly: rope positions continue from the true length and the
        quantized cache's groups are per-position."""
        from .batching import _Prepared
        from .engine import run_prefill

        req = self.requests[rid]
        # a request preempted before its first chunk was ever collected may
        # still carry the async-admission sentinel — resolve it (tiny fetch)
        self._materialize_first(req)
        ids = req.prompt_ids + req.tokens[:-1]
        l, l_pad, _ = self._resume_shape(req)
        logits, src_state, l_pad2, _ = run_prefill(
            self.lm, {"input_ids": np.asarray([ids], np.int32)},
            max_tokens=self.window - l_pad,
        )
        assert l_pad2 == l_pad, (l_pad2, l_pad)
        return _Prepared(
            src_state=src_state, first=req.tokens[-1], l_pad=l_pad,
            n_pads=l_pad - l, prompt_ids=req.prompt_ids,
            max_tokens=req.max_tokens, temperature=req.temperature,
            top_p=req.top_p, top_k=req.top_k, min_p=req.min_p, stop=req.stop,
            rid=rid, ids=ids,
        )

    def admit_resume(self, prepared) -> bool:
        """Admit a prepared resume if it is still the queue head and still
        feasible; False leaves it queued (the prefill is discarded — rare,
        only when resources vanished between prepare and admit)."""
        if not self.preempted or self.preempted[0] != prepared.rid:
            return False
        req = self.requests[prepared.rid]
        _, _, n_pages = self._resume_shape(req)
        if not self.free or n_pages > len(self._free_pages):
            return False
        self.preempted.pop(0)
        self.admit(prepared)
        return True

    def _try_resume(self) -> None:
        """In-step resume for direct step() users.  A scheduler that manages
        resumes itself (prefill outside its lock) sets ``resume_in_step``
        False to disable this path."""
        if not getattr(self, "resume_in_step", True):
            return
        while True:
            rid = self.resume_candidate()
            if rid is None:
                break
            if not self.admit_resume(self.prepare_resume(rid)):
                break

    # -- decode -------------------------------------------------------------

    def _on_slot_freed(self, slot: int) -> None:
        self._release_slot(slot)

    def fail_all_active(self, message: str) -> None:
        for rid in self.preempted:
            self._fail_request(self.requests[rid], message)
        self.preempted.clear()
        super().fail_all_active(message)
        self._free_pages = list(range(self.pool_pages))
        self._slot_pages = {}

    def _pages_needed(self, req, n_steps: int) -> int:
        start = req.l_pad + len(req.tokens) - req.adopted_at
        last = min(start + n_steps - 1, self.window - 1)
        return last // self.page_size + 1

    def _spec_fn(self, n_passes: int, sampling: bool):
        uniform = self.spec_uniform
        fkey = ("spec", n_passes, self.spec_k, sampling, uniform)
        if fkey not in self._step_fns:
            cfg, eos_id = self.lm.cfg, self.lm.eos_id
            page = self.page_size

            def f(params, tree, active, temps, tops, topks, minps, key,
                  spec_ok, _n=n_passes, _k=self.spec_k, _s=sampling,
                  _u=uniform):
                toks, maxlp, eoslp, n_emits, st = _paged_spec_decode_chunk(
                    params, cfg, PagedState.from_tree(tree), active, page, _n,
                    _k, eos_id=eos_id,
                    temps=temps if _s else None,
                    top_ps=tops if _s else None,
                    top_ks=topks if _s else None,
                    min_ps=minps if _s else None, key=key,
                    spec_ok=spec_ok if _u else None,
                )
                return toks, maxlp, eoslp, n_emits, st.tree()

            self._step_fns[fkey] = jax.jit(f, donate_argnums=(1,))
        return self._step_fns[fkey]

    def _plain_fn(self, n_steps: int, sampling: bool):
        fkey = (n_steps, sampling)
        if fkey not in self._step_fns:
            cfg, eos_id = self.lm.cfg, self.lm.eos_id
            page = self.page_size

            def f(params, tree, active, temps, tops, topks, minps, key,
                  _n=n_steps, _s=sampling):
                toks, maxlp, eoslp, st = _paged_decode_chunk(
                    params, cfg, PagedState.from_tree(tree), active, page, _n,
                    temps=temps if _s else None,
                    top_ps=tops if _s else None,
                    top_ks=topks if _s else None,
                    min_ps=minps if _s else None, key=key, eos_id=eos_id,
                )
                return toks, maxlp, eoslp, st.tree()

            self._step_fns[fkey] = jax.jit(f, donate_argnums=(1,))
        return self._step_fns[fkey]

    def _reserve(self, n_steps: int, use_spec: bool) -> bool:
        """Make room for every page this chunk can touch.

        Worst-case column growth: every verify pass can commit K+1 columns
        per slot; an uncollected pipelined chunk's growth is still pending
        (its tokens are not in ``req.tokens`` yet), so it counts too.  On
        pool pressure, first collect the in-flight chunk (its completions
        free pages; preempting while it still writes through the old page
        table would corrupt reallocated pages), then preempt the youngest
        request (cheapest recompute) instead of raising — it resumes via
        _try_resume when pages free up.
        """
        growth = n_steps * (self.spec_k + 1) if use_spec else n_steps
        while True:
            pending = self._pending_growth()
            shortfall = sum(
                max(0, self._pages_needed(r, pending + growth)
                    - len(self._slot_pages[r.slot]))
                for r in self.by_slot.values()
            ) - len(self._free_pages)
            if shortfall <= 0:
                break
            if self._inflight:
                for rid, toks in self.flush().items():
                    self._orphan_out.setdefault(rid, []).extend(toks)
                if not self.by_slot:
                    return False
                continue
            if len(self.by_slot) == 1:
                (req,) = self.by_slot.values()
                slot = req.slot
                del self.by_slot[slot]
                self.free.append(slot)
                self._release_slot(slot)
                self._fail_request(
                    req, f"page pool too small ({self.pool_pages} pages) for "
                         f"a lone request's next chunk")
                return False
            # Vision requests are preemption-exempt: the recompute resume is
            # text-only and cannot rebuild their image cache columns.  Prefer
            # the youngest text victim; with only vision requests active,
            # fail the youngest loudly instead of corrupting it.
            text_reqs = [r for r in self.by_slot.values() if not r.has_images]
            if text_reqs:
                victim = max(text_reqs, key=lambda r: r.rid)
                self._preempt(victim)
            else:
                victim = max(self.by_slot.values(), key=lambda r: r.rid)
                slot = victim.slot
                del self.by_slot[slot]
                self.free.append(slot)
                self._release_slot(slot)
                self._fail_request(
                    victim,
                    "page pool exhausted with only vision requests active — "
                    "vision caches cannot be recompute-resumed; raise "
                    "pool_pages or reduce concurrent image requests")
        pending = self._pending_growth()
        # Pre-allocate, per active slot.
        for slot, req in self.by_slot.items():
            needed = self._pages_needed(req, pending + growth)
            have = len(self._slot_pages[slot])
            while needed > have:
                (pid,) = self._alloc_pages(1)
                self._slot_pages[slot].append(pid)
                self.state.page_tables = self.state.page_tables.at[
                    slot, have
                ].set(pid)
                have += 1
        return True
