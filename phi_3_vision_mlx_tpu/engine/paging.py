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
                 sin, tokens):
        self.pool_k = pool_k  # (nl, P, KV, page, D)
        self.pool_v = pool_v
        self.page_tables = page_tables  # (S, max_pages) int32; P = unallocated
        self.offsets = offsets
        self.pads = pads
        self.valid = valid  # (S, W) logical key validity
        self.cos = cos
        self.sin = sin
        self.tokens = tokens

    def tree(self):
        return (self.pool_k, self.pool_v, self.page_tables, self.offsets,
                self.pads, self.valid, self.cos, self.sin, self.tokens)

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
                        page: int, n_steps: int):
    """``n_steps`` greedy steps for all slots over the paged pool, one
    dispatch.  The host pre-allocates every page the chunk can touch
    (PagedBatchEngine.step), so in-chunk page crossings are just table
    lookups.  Returns (tokens (n_steps, S), new state)."""
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

    def one_step(carry, _):
        tok, offsets, valid, pk, pv = carry
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
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)

        new_valid = jnp.where(
            active[:, None], valid.at[slot_ids, offsets].set(True), valid
        )
        new_offsets = jnp.where(active, offsets + 1, offsets)
        new_tok = jnp.where(active, nxt, tok)
        return (new_tok, new_offsets, new_valid, pk, pv), nxt

    carry0 = (st.tokens, st.offsets, st.valid, st.pool_k, st.pool_v)
    (tok_f, off_f, valid_f, pk, pv), toks = lax.scan(
        one_step, carry0, None, length=n_steps
    )
    return toks, PagedState(
        pool_k=pk, pool_v=pv, page_tables=st.page_tables, offsets=off_f,
        pads=st.pads, valid=valid_f, cos=st.cos, sin=st.sin, tokens=tok_f,
    )


def _paged_adopt(cfg: ModelConfig, st: PagedState, slot, src_state, last_token,
                 l_pad: int, n_pads, page_ids, page: int):
    """Scatter a prefilled request's cache columns into its allocated pages
    and install the slot's page-table row.

    page_ids: (max_pages,) int32 — ceil(l_pad/page) real ids then sentinel
    fill.  When ``page`` does not divide ``l_pad`` (page_size > the 64-token
    prompt bucket), the trailing partial page's unused columns are written as
    zeros — harmless, the validity bits mask them.
    """
    n_pages = -(-l_pad // page)
    l_full = n_pages * page
    if cfg.use_quantized_cache:
        # transposed quantized layout: (nl, KV, rows, W) -> per-page slices
        k_cols = src_state.kv.k[:, 0, :, :, :l_pad]
        s_cols = src_state.kv.k_scales[:, 0, :, :, :l_pad]
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
        k_cols = src_state.kv.k[:, 0, :, :l_pad]
        v_cols = src_state.kv.v[:, 0, :, :l_pad]
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
    row_valid = jnp.concatenate(
        [src_state.valid[0, :l_pad], jnp.zeros((w - l_pad,), bool)]
    )
    valid = lax.dynamic_update_slice(st.valid, row_valid[None], (slot, 0))
    return PagedState(
        pool_k=pool_k, pool_v=pool_v, page_tables=page_tables,
        offsets=st.offsets.at[slot].set(jnp.asarray(l_pad, jnp.int32)),
        pads=st.pads.at[slot].set(jnp.asarray(n_pads, jnp.int32)),
        valid=valid, cos=st.cos, sin=st.sin,
        tokens=st.tokens.at[slot].set(last_token),
    )


class PagedBatchEngine(BatchEngine):
    """Continuous batching over a shared page pool.

    ``pool_pages`` bounds total cache memory; default gives every slot its
    full window (no saving — size it to your traffic, e.g.
    ``slots * window // (2 * page_size)`` for 2x memory efficiency when
    requests average under half the window).
    """

    def __init__(self, lm, processor, slots: int = 4, window: int = 1024,
                 page_size: int = 64, pool_pages: int = 0):
        if 64 % page_size and page_size % 64:
            raise ValueError("page_size must divide or be a multiple of 64")
        if window % page_size:
            raise ValueError("window must be a multiple of page_size")
        self.page_size = page_size
        self.pool_pages = pool_pages or slots * (window // page_size)
        self._free_pages: List[int] = list(range(self.pool_pages))
        self._slot_pages: Dict[int, List[int]] = {}
        super().__init__(lm, processor, slots=slots, window=window)

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

    def submit(self, prompt: str, max_tokens: int = 512) -> int:
        from .engine import round_up, run_prefill

        if not self.free:
            raise RuntimeError("no free slots; call step() until one frees")
        slot = self.free.pop()
        dict_input = self.processor(prompt)
        l = int(np.asarray(dict_input["input_ids"]).shape[1])
        l_guess = max(round_up(l, 64), 64)
        if l_guess >= self.window:
            self.free.append(slot)
            raise ValueError(f"prompt ({l_guess}) does not fit window {self.window}")
        logits, src_state, l_pad, src_window = run_prefill(
            self.lm, dict_input, max_tokens=self.window - l_guess
        )
        assert src_window == self.window, (src_window, self.window)
        first = int(np.argmax(jax.device_get(logits), axis=-1)[0])

        page = self.page_size
        mp = self.window // page
        try:
            ids = self._alloc_pages(-(-l_pad // page))
        except RuntimeError:
            self.free.append(slot)
            raise
        self._slot_pages[slot] = list(ids)
        table_row = np.full((mp,), self.pool_pages, np.int32)
        table_row[: len(ids)] = ids

        if l_pad not in self._adopt_fns:
            cfg = self.lm.cfg

            self._adopt_fns[l_pad] = jax.jit(
                lambda t, slot, src, tok, pads, prow, _l=l_pad: _paged_adopt(
                    cfg, PagedState.from_tree(t), slot, src, tok, _l, pads,
                    prow, page,
                ).tree()
            )
        self.state = PagedState.from_tree(
            self._adopt_fns[l_pad](
                self.state.tree(), jnp.asarray(slot, jnp.int32), src_state,
                jnp.asarray(first, jnp.int32), jnp.asarray(l_pad - l, jnp.int32),
                jnp.asarray(table_row),
            )
        )
        rid = self._next_rid
        self._next_rid += 1
        req = _Request(
            rid=rid, slot=slot, tokens=[first], max_tokens=max_tokens, l_pad=l_pad
        )
        if first == self.lm.eos_id:
            req.done = True
            self._release_slot(slot)
            self.free.append(slot)
        else:
            self.by_slot[slot] = req
        self.requests[rid] = req
        return rid

    # -- decode -------------------------------------------------------------

    def _on_slot_freed(self, slot: int) -> None:
        self._release_slot(slot)

    def step(self, n_steps: int = 1) -> Dict[int, List[int]]:
        if not self.by_slot:
            return {}
        page = self.page_size
        # Pre-allocate every page this chunk can touch, per active slot.
        for slot, req in self.by_slot.items():
            start = req.l_pad + len(req.tokens) - 1
            last = min(start + n_steps - 1, self.window - 1)
            needed = last // page + 1
            have = len(self._slot_pages[slot])
            while needed > have:
                (pid,) = self._alloc_pages(1)
                self._slot_pages[slot].append(pid)
                self.state.page_tables = self.state.page_tables.at[
                    slot, have
                ].set(pid)
                have += 1

        if n_steps not in self._step_fns:
            cfg = self.lm.cfg

            def f(params, tree, active, _n=n_steps):
                toks, st = _paged_decode_chunk(
                    params, cfg, PagedState.from_tree(tree), active, page, _n
                )
                return toks, st.tree()

            self._step_fns[n_steps] = jax.jit(f, donate_argnums=(1,))
        active = np.zeros((self.slots,), bool)
        for slot in self.by_slot:
            active[slot] = True
        toks, tree = self._step_fns[n_steps](
            self.lm.params, self.state.tree(), jnp.asarray(active)
        )
        self.state = PagedState.from_tree(tree)
        toks = jax.device_get(toks)
        out: Dict[int, List[int]] = {}
        for slot, req in list(self.by_slot.items()):
            emitted = out.setdefault(req.rid, [])
            for i in range(n_steps):
                tok = int(toks[i, slot])
                req.tokens.append(tok)
                emitted.append(tok)
                hit_window = req.l_pad + len(req.tokens) >= self.window - 1
                if (
                    tok == self.lm.eos_id
                    or len(req.tokens) >= req.max_tokens
                    or hit_window
                ):
                    req.done = True
                    del self.by_slot[slot]
                    self.free.append(slot)
                    self._on_slot_freed(slot)
                    break
        return out
