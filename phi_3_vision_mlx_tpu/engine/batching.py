"""Continuous batching: a slot-based serving engine.

The reference serves requests one `generate()` call at a time (its batched
mode requires all prompts to arrive together, phi_3_vision_mlx.py:376-409).
Production serving wants *continuous* batching: requests join and leave the
decode batch independently, so the accelerator always decodes a full batch.

TPU-first design — everything static-shaped:

* The batch is ``slots`` fixed decode lanes over a shared preallocated cache
  ``(num_layers, slots, KV, window, D)`` — per-slot contiguous windows (one
  big page per request; a paged refinement would split the window further).
* Each slot carries its own ``offset``; masks and rope slices are computed
  per-slot from an offsets *vector* (the single-stream engine's scalar
  offset generalized), so one compiled step serves any mix of requests.
* Admission runs the ordinary bucketed prefill for the new request, then a
  compiled ``adopt`` op copies its cache columns into the slot.  Finished
  slots are simply marked free — the next admission overwrites them.

Greedy decoding, text-only; serves both the dense cache and the packed
int4/int8-quantized cache (engine/state.py layouts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.config import ModelConfig
from ..models import phi3
from ..ops.linear import dense, embedding
from ..ops.norms import rms_norm
from ..ops.rope import apply_rotary, su_rope_tables
from .stream import stop_tail_window, validate_stops

# Sentinel token value standing in for an async-admitted request's first
# token until its device value is fetched (no real vocab id is negative).
_FIRST_PENDING = -1


class SlotState:
    """Device-side state of all slots (functional; replaced each step)."""

    def __init__(self, kv_k, kv_v, offsets, pads, valid, cos, sin, tokens,
                 buf=None):
        self.kv_k = kv_k  # (nl, S, KV, W, D)
        self.kv_v = kv_v
        self.offsets = offsets  # (S,) int32 — committed cache columns per slot
        self.pads = pads  # (S,) int32 — left-pad count (rope pos = offset-pads)
        self.valid = valid  # (S, W) bool key validity
        self.cos = cos  # (S, W, D) per-slot rope tables
        self.sin = sin
        self.tokens = tokens  # (S,) int32 — last sampled token per slot
        # (S, W) int32 token history aligned with cache columns — feeds the
        # prompt-lookup draft proposer (engine/speculative.py); performance
        # metadata only, never a correctness input (verification is exact).
        self.buf = (
            buf if buf is not None else jnp.zeros(valid.shape, jnp.int32)
        )

    def tree(self):
        return (self.kv_k, self.kv_v, self.offsets, self.pads, self.valid,
                self.cos, self.sin, self.tokens, self.buf)

    @classmethod
    def from_tree(cls, t):
        return cls(*t)


def _init_slots(cfg: ModelConfig, slots: int, window: int, dtype):
    nl, kvh, d = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    cos, sin = su_rope_tables(cfg, window)  # (1, W, D)
    if cfg.use_quantized_cache:
        # packed quantized layout (engine/state.py init_state): kv_k holds the
        # uint8 payload (L last), kv_v the fused bf16 scale/bias planes.
        g = cfg.kv_quant.group_size
        groups = max(1, d // g)
        payload_rows = d if cfg.kv_quant.bits == 4 else 2 * d
        return SlotState(
            kv_k=jnp.zeros((nl, slots, kvh, payload_rows, window), jnp.uint8),
            kv_v=jnp.zeros((nl, slots, kvh, 4 * groups, window), jnp.bfloat16),
            offsets=jnp.zeros((slots,), jnp.int32),
            pads=jnp.zeros((slots,), jnp.int32),
            valid=jnp.zeros((slots, window), bool),
            cos=jnp.broadcast_to(cos, (slots,) + cos.shape[1:]),
            sin=jnp.broadcast_to(sin, (slots,) + sin.shape[1:]),
            tokens=jnp.zeros((slots,), jnp.int32),
        )
    return SlotState(
        kv_k=jnp.zeros((nl, slots, kvh, window, d), dtype),
        kv_v=jnp.zeros((nl, slots, kvh, window, d), dtype),
        offsets=jnp.zeros((slots,), jnp.int32),
        pads=jnp.zeros((slots,), jnp.int32),
        valid=jnp.zeros((slots, window), bool),
        cos=jnp.broadcast_to(cos, (slots,) + cos.shape[1:]),
        sin=jnp.broadcast_to(sin, (slots,) + sin.shape[1:]),
        tokens=jnp.zeros((slots,), jnp.int32),
    )


def _decode_chunk(params, cfg: ModelConfig, st: SlotState, active,
                  n_steps: int, temps=None, top_ps=None, top_ks=None,
                  min_ps=None, key=None, eos_id: int = 0):
    """``n_steps`` decode steps for every slot in ONE dispatch.

    Chunking amortizes dispatch latency (through the remote tunnel a single
    step costs ~30 ms of dispatch alone); requests join/leave only at chunk
    boundaries, and a slot that finishes mid-chunk wastes at most the rest of
    the chunk (host trims; adoption resets the slot).  active: (S,) bool.

    ``temps``/``top_ps``/``top_ks``/``min_ps``: optional device (S,)
    vectors — per-slot sampling (rows with temp <= 0 stay exact-greedy);
    temps=None compiles the pure-greedy step with no sort.  Returns (tokens (n_steps, S), maxlp (n_steps, S),
    eoslp (n_steps, S), new state) — the per-step log-prob stats feed the
    host-side LogitStopper exactly as the single-stream engine's chunk_fn.
    """
    mdl = params["model"]
    s, w = st.valid.shape
    light, heavy = phi3._partition_heavy(mdl["layers"])
    key_pos = jnp.arange(w)
    slot_ids = jnp.arange(s)
    scale = cfg.head_dim**-0.5
    quantized = cfg.use_quantized_cache

    def one_step(carry, step_i):
        tok, offsets, valid, kv_k, kv_v, buf = carry
        # Record the input token at its cache column so a later speculative
        # chunk can propose drafts from this history (metadata only).
        buf = jnp.where(
            active[:, None], buf.at[slot_ids, offsets].set(tok, mode="drop"),
            buf,
        )
        x = embedding(mdl["embed_tokens"], tok[:, None]).astype(
            jnp.dtype(cfg.dtype)
        )  # (S, 1, E)

        # Per-slot rope at each slot's own *logical* position: left-padded
        # prompts continue from their true length, not the cache column
        # (reference extended-pids semantics, phi.py:496-497).
        idx = (offsets - st.pads)[:, None, None]
        cos = jnp.take_along_axis(
            st.cos, jnp.broadcast_to(idx, (s, 1, st.cos.shape[-1])), 1
        )
        sin = jnp.take_along_axis(
            st.sin, jnp.broadcast_to(idx, (s, 1, st.sin.shape[-1])), 1
        )

        # Causal mask: past validity bits plus the fresh token's own column
        # (written inside the layer body before attending; its validity bit
        # commits after the step).
        fresh = key_pos[None, :] == offsets[:, None]
        allowed = ((key_pos[None, :] <= offsets[:, None]) & valid) | fresh
        allowed = allowed[:, None, None, :]  # (S,1,1,W)

        def body(carry, xs):
            y, kk, vv = carry
            lp, li = xs
            h = rms_norm(y, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
            qkv = phi3._dense_at(lp, heavy, ("self_attn", "qkv_proj"), h, li)
            q, k, v = phi3._qkv_split(cfg, qkv)
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
            from ..engine.state import LayerKV, quantize_chunk, read_kv
            from ..ops.attention import masked_attention

            if quantized:
                entries = quantize_chunk(k, v, cfg.kv_quant, True)
                kk = kk.at[li, slot_ids, :, :, offsets].set(
                    entries.k[..., 0], mode="drop"
                )
                vv = vv.at[li, slot_ids, :, :, offsets].set(
                    entries.k_scales[..., 0].astype(vv.dtype), mode="drop"
                )
                lkv = LayerKV(
                    k=lax.dynamic_index_in_dim(kk, li, 0, keepdims=False),
                    k_scales=lax.dynamic_index_in_dim(vv, li, 0, keepdims=False),
                )
                kc, vc = read_kv(lkv, y.dtype, cfg.kv_quant.bits)
            else:
                kk = kk.at[li, slot_ids, :, offsets].set(
                    k[:, :, 0, :].astype(kk.dtype), mode="drop"
                )
                vv = vv.at[li, slot_ids, :, offsets].set(
                    v[:, :, 0, :].astype(vv.dtype), mode="drop"
                )
                kc = lax.dynamic_index_in_dim(kk, li, 0, keepdims=False).astype(y.dtype)
                vc = lax.dynamic_index_in_dim(vv, li, 0, keepdims=False).astype(y.dtype)
            o = masked_attention(q, kc, vc, allowed, scale)
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
            return (y, kk, vv), None

        (x, kv_k, kv_v), _ = lax.scan(
            body, (x, kv_k, kv_v), (light, jnp.arange(cfg.num_hidden_layers))
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
        return (new_tok, new_offsets, new_valid, kv_k, kv_v, buf), stats

    carry0 = (st.tokens, st.offsets, st.valid, st.kv_k, st.kv_v, st.buf)
    (tok_f, off_f, valid_f, kv_k, kv_v, buf_f), (toks, maxlp, eoslp) = lax.scan(
        one_step, carry0, jnp.arange(n_steps)
    )
    return toks, maxlp, eoslp, SlotState(
        kv_k=kv_k, kv_v=kv_v, offsets=off_f, pads=st.pads, valid=valid_f,
        cos=st.cos, sin=st.sin, tokens=tok_f, buf=buf_f,
    )


def _spec_decode_chunk(params, cfg: ModelConfig, st: SlotState, active,
                       n_passes: int, k_draft: int, eos_id: int = 0,
                       temps=None, top_ps=None, top_ks=None, min_ps=None,
                       key=None, spec_ok=None):
    """``n_passes`` speculative verify passes for every slot in ONE dispatch.

    Per pass each slot proposes K draft tokens from its token history
    (prompt-lookup, engine/speculative.py) and verifies them in a single
    (S, K+1) forward; accepted drafts advance that slot's offset by 1..K+1,
    so one weight pass serves up to K+1 tokens *per slot*.  Greedy rows'
    emitted streams are bit-identical to :func:`_decode_chunk`'s
    (on TPU with the int4-quantized cache, identical up to fp-shape noise at
    quantization boundaries — see paging._paged_spec_decode_chunk's
    exactness note, which applies to both slot engines); sampled rows
    (``temps`` vectors set) use rejection-sampled verification and are
    distribution-exact (engine/speculative.py:verify_mixed_rows).

    ``spec_ok``: optional device (S,) bool — the UNIFORM-dispatch mode.
    Rows with ``spec_ok`` False (or whose window cannot absorb a worst-case
    pass) run this pass as a PADDED VANILLA step: the forward keeps the
    (S, K+1) shape but acceptance is forced to zero, so exactly one token
    commits (greedy rows emit the row-0 argmax — the same value the
    (S, K+1)-shaped vanilla step would emit; sampled rows draw a plain
    filtered sample from the row-0 logits).  Because every dispatch then
    shares one compiled shape, greedy streams are bit-identical across
    spec-on/spec-off/window-tail regimes even where XLA's fp tiling is
    shape-dependent (the slot-engine analog of the single-stream 8-row
    pad).  With ``spec_ok=None`` (legacy mode) slots whose window cannot
    absorb a worst-case pass go dead (``n_emit`` 0, no writes — the host
    finalizes them as window-full or tails through lq=1 vanilla chunks).

    Returns (tokens (n, S, K+1), maxlp, eoslp, n_emits (n, S), new state).
    """
    from .speculative import propose_drafts

    mdl = params["model"]
    s, w = st.valid.shape
    light, heavy = phi3._partition_heavy(mdl["layers"])
    key_pos = jnp.arange(w)
    slot_ids = jnp.arange(s)
    scale = cfg.head_dim**-0.5
    quantized = cfg.use_quantized_cache
    kk1 = k_draft + 1
    ar = jnp.arange(kk1)
    uniform = spec_ok is not None

    if key is None:
        key = jax.random.PRNGKey(0)

    def one_pass(carry, _):
        tok, offsets, valid, kv_k, kv_v, buf, k_it = carry
        if uniform:
            # Uniform mode: a slot stays live until its window is truly
            # full; rows without room for a full pass (or opted out) fall
            # back to forced-reject (1 token/pass) within the same dispatch.
            live = active & (offsets + 1 <= w)
            can_spec = live & spec_ok & (offsets + kk1 <= w)
        else:
            live = active & (offsets + kk1 <= w)
            can_spec = live
        draft = propose_drafts(buf, valid, tok[:, None], offsets, k_draft)
        ids = jnp.concatenate([tok[:, None], draft], axis=1)  # (S, kk1)
        wpos = offsets[:, None] + ar[None, :]  # cache column per query
        # dead slots write nowhere: clamp to an OOB column + mode="drop"
        if uniform:
            # per-element clamp: live tail slots write the in-window prefix
            wpos_safe = jnp.where(live[:, None] & (wpos < w), wpos, w)
        else:
            wpos_safe = jnp.where(live[:, None], wpos, w)
        buf = buf.at[slot_ids[:, None], wpos_safe].set(ids, mode="drop")
        x = embedding(mdl["embed_tokens"], ids).astype(jnp.dtype(cfg.dtype))

        pidx = jnp.clip((offsets - st.pads)[:, None] + ar[None, :], 0, w - 1)
        cos = jnp.take_along_axis(
            st.cos, jnp.broadcast_to(pidx[:, :, None], (s, kk1, st.cos.shape[-1])), 1
        )
        sin = jnp.take_along_axis(
            st.sin, jnp.broadcast_to(pidx[:, :, None], (s, kk1, st.sin.shape[-1])), 1
        )

        # Causal mask per query position: committed past + the fresh columns
        # written by this pass (write-then-attend inside the layer body).
        fresh = (key_pos[None, None, :] >= offsets[:, None, None]) & (
            key_pos[None, None, :] <= wpos[:, :, None]
        )
        allowed = (
            (key_pos[None, None, :] <= wpos[:, :, None]) & valid[:, None, :]
        ) | fresh
        allowed = allowed[:, None]  # (S, 1, kk1, W)

        def body(carry, xs):
            y, kk_, vv_ = carry
            lp, li = xs
            h = rms_norm(y, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
            qkv = phi3._dense_at(lp, heavy, ("self_attn", "qkv_proj"), h, li)
            q, k, v = phi3._qkv_split(cfg, qkv)
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
            from ..engine.state import LayerKV, quantize_chunk, read_kv
            from ..ops.attention import masked_attention

            if quantized:
                entries = quantize_chunk(k, v, cfg.kv_quant, True)
                kk_ = kk_.at[li, slot_ids[:, None], :, :, wpos_safe].set(
                    entries.k.transpose(0, 3, 1, 2), mode="drop"
                )
                vv_ = vv_.at[li, slot_ids[:, None], :, :, wpos_safe].set(
                    entries.k_scales.transpose(0, 3, 1, 2).astype(vv_.dtype),
                    mode="drop",
                )
                lkv = LayerKV(
                    k=lax.dynamic_index_in_dim(kk_, li, 0, keepdims=False),
                    k_scales=lax.dynamic_index_in_dim(vv_, li, 0, keepdims=False),
                )
                kc, vc = read_kv(lkv, y.dtype, cfg.kv_quant.bits)
            else:
                kk_ = kk_.at[li, slot_ids[:, None], :, wpos_safe].set(
                    k.transpose(0, 2, 1, 3).astype(kk_.dtype), mode="drop"
                )
                vv_ = vv_.at[li, slot_ids[:, None], :, wpos_safe].set(
                    v.transpose(0, 2, 1, 3).astype(vv_.dtype), mode="drop"
                )
                kc = lax.dynamic_index_in_dim(kk_, li, 0, keepdims=False).astype(y.dtype)
                vc = lax.dynamic_index_in_dim(vv_, li, 0, keepdims=False).astype(y.dtype)
            o = masked_attention(q, kc, vc, allowed, scale)
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
            return (y, kk_, vv_), None

        (x, kv_k, kv_v), _ = lax.scan(
            body, (x, kv_k, kv_v), (light, jnp.arange(cfg.num_hidden_layers))
        )
        x = rms_norm(x, mdl["norm"]["weight"], cfg.rms_norm_eps)
        logits = dense(params["lm_head"], x)[..., : cfg.vocab_size]
        lg = logits.astype(jnp.float32)  # (S, kk1, V)
        lp_all = jax.nn.log_softmax(lg, axis=-1)
        k_it, k_use = jax.random.split(k_it)
        if temps is None:
            out = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # (S, kk1)
            match = (draft == out[:, :-1]).astype(jnp.int32)
            acc = jnp.cumprod(match, axis=1).sum(axis=1)  # (S,)
        else:
            from .speculative import verify_mixed_rows

            out, acc = verify_mixed_rows(
                lg, draft, k_use, temps, top_ps, top_ks, min_ps
            )
        if uniform:
            # Forced-reject rows commit exactly one token: greedy rows'
            # out[:, 0] is already the row-0 argmax (the padded vanilla
            # token); sampled rows need a PLAIN filtered sample from the
            # row-0 logits (verify_mixed_rows' rejection residual masks the
            # draft token out, which is not vanilla sampling).
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
        return (new_tok, new_offsets, new_valid, kv_k, kv_v, buf, k_it), stats

    carry0 = (st.tokens, st.offsets, st.valid, st.kv_k, st.kv_v, st.buf, key)
    (tok_f, off_f, valid_f, kv_k, kv_v, buf_f, _), (toks, maxlp, eoslp, n_emits) = (
        lax.scan(one_pass, carry0, jnp.arange(n_passes))
    )
    return toks, maxlp, eoslp, n_emits, SlotState(
        kv_k=kv_k, kv_v=kv_v, offsets=off_f, pads=st.pads, valid=valid_f,
        cos=st.cos, sin=st.sin, tokens=tok_f, buf=buf_f,
    )


def _adopt(cfg: ModelConfig, st: SlotState, slot, src_state, last_token, l_pad,
           n_pads, prompt_row=None, src_row=0):
    """Copy a freshly prefilled request's cache into ``slot``.

    src_state: the DecodeState from run_prefill (window >= l_pad); row
    ``src_row`` of its batch is the request being adopted (batch > 1 when
    the scheduler prefilled several queued admissions in one dispatch).
    Static ``l_pad`` keeps the copy shape compiled.
    ``prompt_row``: optional (l_pad,) int32 padded prompt ids — seeds the
    slot's token-history buffer for the speculative draft proposer.
    """
    row = lambda a: lax.dynamic_index_in_dim(a, src_row, axis=1, keepdims=False)
    if cfg.use_quantized_cache:
        # quantized layout keeps L last: copy payload + scale-plane columns
        k_cols = row(src_state.kv.k)[:, :, :, :l_pad]  # (nl, KV, rows, l_pad)
        s_cols = row(src_state.kv.k_scales)[:, :, :, :l_pad]
        kv_k = lax.dynamic_update_slice(
            st.kv_k, k_cols[:, None].astype(st.kv_k.dtype), (0, slot, 0, 0, 0)
        )
        kv_v = lax.dynamic_update_slice(
            st.kv_v, s_cols[:, None].astype(st.kv_v.dtype), (0, slot, 0, 0, 0)
        )
    else:
        k_cols = row(src_state.kv.k)[:, :, :l_pad]  # (nl, KV, l_pad, D)
        v_cols = row(src_state.kv.v)[:, :, :l_pad]
        kv_k = lax.dynamic_update_slice(
            st.kv_k, k_cols[:, None].astype(st.kv_k.dtype), (0, slot, 0, 0, 0)
        )
        kv_v = lax.dynamic_update_slice(
            st.kv_v, v_cols[:, None].astype(st.kv_v.dtype), (0, slot, 0, 0, 0)
        )
    w = st.valid.shape[1]
    src_valid = lax.dynamic_index_in_dim(src_state.valid, src_row, axis=0,
                                         keepdims=False)
    row_valid = jnp.concatenate(
        [src_valid[:l_pad], jnp.zeros((w - l_pad,), bool)]
    )
    valid = lax.dynamic_update_slice(st.valid, row_valid[None], (slot, 0))
    offsets = st.offsets.at[slot].set(jnp.asarray(l_pad, jnp.int32))
    pads = st.pads.at[slot].set(jnp.asarray(n_pads, jnp.int32))
    tokens = st.tokens.at[slot].set(last_token)
    buf = st.buf
    if prompt_row is not None:
        buf = lax.dynamic_update_slice(
            buf, prompt_row.astype(jnp.int32)[None], (slot, 0)
        )
    # cos/sin stay: every slot uses the window-global su-rope tables (submit
    # pins the prefill window to the serving window, so regimes agree).
    return SlotState(
        kv_k, kv_v, offsets, pads, valid, st.cos, st.sin, tokens, buf=buf
    )


@dataclass
class _Request:
    rid: int
    slot: int
    tokens: List[int] = field(default_factory=list)
    done: bool = False
    max_tokens: int = 512
    l_pad: int = 0
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    stop: object = None  # list of stop strings (host-side text matching)
    error: str = ""
    prompt_ids: List[int] = field(default_factory=list)  # preemption resume
    stopper: object = None  # per-request LogitStopper (early_stop)
    # tokens already counted inside l_pad at (re-)admission: 1 for a fresh
    # request (only the prefill token is pending), len(tokens) after a
    # preemption resume (the resumed prefill re-absorbed the earlier ones).
    adopted_at: int = 1
    # Async admission: the prefill's argmax stays ON DEVICE (first_dev row
    # first_row); tokens[0] holds the _FIRST_PENDING sentinel until the value
    # rides home with a chunk fetch (collect) or a host path forces it
    # (_materialize_first).  Keeps admission from draining the pipeline.
    first_dev: object = None
    first_row: int = 0
    # True for an image request: its cache cannot be rebuilt by the paged
    # engine's text-only recompute resume, so it is preemption-exempt.
    has_images: bool = False


@dataclass
class _ChunkHandle:
    """An in-flight decode chunk: dispatched to the device, not yet trimmed.

    ``dispatch`` snapshots the slot->rid mapping at enqueue time; ``collect``
    fetches the arrays and trims against that snapshot, so results of a chunk
    survive slots being freed/re-admitted while it is in flight.
    """

    kind: str  # "plain" | "spec"
    arrays: tuple  # device arrays: (toks, maxlp, eoslp[, n_emits])
    slot_rids: Dict[int, int]
    n_steps: int
    growth: int = 0  # worst-case cache columns this chunk appends per slot
    # (S,) int32 device copy of state.tokens at dispatch time — carries the
    # first tokens of async-admitted slots home with the chunk fetch (None
    # when no slot has a pending first).
    seed: object = None


@dataclass
class _Prepared:
    """A prefilled-but-not-admitted request.

    :meth:`BatchEngine.prepare` produces one WITHOUT touching engine state —
    safe to run concurrently with the decode pump (the scheduler prefills
    outside its condition lock); :meth:`BatchEngine.admit` then adopts it
    into a free slot under the lock.
    """

    src_state: object
    first: int  # _FIRST_PENDING when async (value lives in first_dev)
    l_pad: int
    n_pads: int
    prompt_ids: List[int]
    max_tokens: int
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    stop: object = None
    early_stop: object = False
    rid: int = -1  # set on resume re-prefills to keep the original rid
    # async admission: (B,) int32 device argmax of the prefill logits;
    # row ``src_row`` is this request's first token
    first_dev: object = None
    has_images: bool = False
    # the ids actually prefilled (prompt + regenerated tokens on a resume);
    # seeds the slot's token-history buffer.  None -> prompt_ids.
    ids: object = None
    # which batch row of src_state is this request (prepare_many prefills
    # several queued admissions in one dispatch; prepare() is row 0 of 1)
    src_row: int = 0


def _first_arg(p: "_Prepared"):
    """The first-token argument for the jitted adopt fn: the device row when
    the prepare was async, else the host int."""
    if p.first_dev is not None:
        return p.first_dev[p.src_row].astype(jnp.int32)
    return jnp.asarray(p.first, jnp.int32)


class BatchEngine:
    """Continuous-batching loop over a fixed slot pool.

    Usage::

        eng = BatchEngine(lm, processor, slots=4, window=1024)
        rid = eng.submit("prompt", max_tokens=64)
        while eng.pending():
            eng.step()
        text = eng.result(rid)
    """

    def __init__(self, lm, processor, slots: int = 4, window: int = 1024,
                 seed: int = 0, spec_k: int = 0, pipeline_depth: int = 1,
                 async_admission: bool = True, spec_accept: bool = True,
                 spec_uniform: Optional[bool] = None):
        from .engine import LM  # noqa: F401  (type only)

        import os

        # Async admission (default): prepare() keeps the prefill argmax on
        # device instead of blocking on device_get — a blocking fetch queues
        # behind every in-flight pipelined chunk, so each admission would
        # drain the pipe and idle the device for a full dispatch+fetch round
        # trip (~0.1-0.8 s through the tunnel), roughly once per chunk under
        # saturated load.  PHI3V_TPU_SYNC_ADMIT=1 restores the blocking path.
        self.async_admission = async_admission and not int(
            os.environ.get("PHI3V_TPU_SYNC_ADMIT", "0")
        )
        self.lm = lm
        self.processor = processor
        self.slots = slots
        if window % 128:
            raise ValueError("window must be a multiple of 128 (engine bucketing)")
        if not 0 <= spec_k <= 32:
            raise ValueError("spec_k must be in [0, 32]")
        self.window = window
        # spec_k > 0: per-slot prompt-lookup speculative decoding — each
        # chunk step verifies K drafts per slot (greedy requests only; a
        # chunk with any sampling request falls back to the vanilla step).
        self.spec_k = spec_k
        self.spec_stats = {"passes": 0, "emitted": 0}
        # Uniform spec dispatch (default with spec_k > 0): every chunk is an
        # (S, K+1)-shaped verify pass; window-tail slots run forced-reject
        # rows (1 token/pass) INSIDE the same dispatch instead of dragging
        # the whole engine to lq=1 vanilla chunks — one compiled shape per
        # run keeps greedy streams bit-reproducible on TPU even where XLA's
        # fp tiling is shape-dependent (see _spec_decode_chunk docstring).
        # PHI3V_TPU_SPEC_UNIFORM=0 restores the legacy tail-switch path.
        if spec_uniform is None:
            spec_uniform = bool(int(os.environ.get(
                "PHI3V_TPU_SPEC_UNIFORM", "1")))
        self.spec_uniform = bool(spec_uniform) and spec_k > 0
        # spec_accept=False: every row is forced-reject — a padded-vanilla
        # baseline engine that commits exactly one token per pass through
        # the SAME compiled fn the accepting engine runs (the bit-exactness
        # reference for tests/benchmarks; see paging.py exactness note).
        self.spec_accept = bool(spec_accept)
        # Slots whose window is too tight for a worst-case verify pass;
        # while any is active the engine steps vanilla so their tails emit
        # exactly the non-speculative stream (they leave the set when freed).
        # (Legacy mode only — uniform dispatch handles tails on device.)
        self._tail_slots: set = set()
        self.state = self._init_state()
        self.free: List[int] = list(range(slots))
        self.requests: Dict[int, _Request] = {}
        self.by_slot: Dict[int, _Request] = {}
        self._next_rid = 0
        self._step_fns: Dict[object, object] = {}
        self._adopt_fns = {}
        self._base_key = jax.random.PRNGKey(seed)
        self._chunk_i = 0
        # _ChunkHandles enqueued by step_pipelined, oldest first.  Depth >1
        # keeps several chunks in flight so a long dispatch+fetch round trip
        # (a remote tunnel) amortizes across depth chunks instead of gating
        # every tick; cost: completion detected up to `depth` chunks late.
        self._inflight: list = []
        self.pipeline_depth = max(1, int(pipeline_depth))
        # Tokens trimmed by an internal flush (e.g. paged reservation under
        # pool pressure) that no caller has picked up yet; merged into the
        # next collect()'s return value so streaming callers never lose them.
        self._orphan_out: Dict[int, List[int]] = {}

    def _init_state(self):
        return _init_slots(
            self.lm.cfg, self.slots, self.window, jnp.dtype(self.lm.cfg.dtype)
        )

    # -- admission ----------------------------------------------------------

    def prepare(self, prompt: str, max_tokens: int = 512,
                temperature: float = 0.0, top_p: float = 1.0,
                top_k: int = 0, min_p: float = 0.0, stop=None,
                early_stop=False, images=None) -> _Prepared:
        """Tokenize + prefill a request WITHOUT touching engine state.

        Long prompts chunk-prefill inside run_prefill; nothing here races
        decode, so a scheduler can run this outside its lock while the pump
        keeps stepping active slots.

        ``images``: optional list of PIL images — the prompt must carry the
        matching ``<|image_i|>`` tags (reference Phi3VProcessor semantics).
        The vision prefill runs the fused device pipeline
        (engine.run_prefill's raw-image path) and the resulting cache
        columns adopt into a slot exactly like a text prefill: image tokens
        are just cache columns by decode time.  Vision processing is
        batch-1 (reference parity, phi_3_vision_mlx.py:377-378), so image
        requests go through prepare(), never prepare_many().
        """
        from .engine import round_up, run_prefill

        dict_input = (
            self.processor(prompt, images) if images is not None
            else self.processor(prompt)
        )
        ids = np.asarray(dict_input["input_ids"])
        l = int(ids.shape[1])
        l_guess = max(round_up(l, 64), 64)
        if l_guess >= self.window:
            raise ValueError(
                f"prompt ({l_guess} tokens bucketed) does not fit window "
                f"{self.window}"
            )
        # Pin the prefill window to the serving window: identical su-rope
        # regime + table, and the adopted cache columns line up 1:1.
        logits, src_state, l_pad, src_window = run_prefill(
            self.lm, dict_input, max_tokens=self.window - l_guess
        )
        assert src_window == self.window, (src_window, self.window)
        if self.async_admission:
            first, first_dev = _FIRST_PENDING, jnp.argmax(
                jnp.asarray(logits), axis=-1
            ).astype(jnp.int32)
        else:
            first, first_dev = int(
                np.argmax(jax.device_get(logits), axis=-1)[0]
            ), None
        return _Prepared(
            src_state=src_state, first=first, first_dev=first_dev,
            l_pad=l_pad, n_pads=l_pad - l,
            prompt_ids=[int(t) for t in ids[0]], max_tokens=max_tokens,
            temperature=temperature, top_p=top_p, top_k=top_k, min_p=min_p,
            stop=validate_stops(stop),
            early_stop=early_stop, has_images=images is not None,
        )

    def prepare_many(self, prompts: List[str], opts: List[dict]) -> List[_Prepared]:
        """Prefill SEVERAL queued admissions in ONE batched dispatch.

        One-prompt-per-dispatch admission was the serving bottleneck under
        bursts (each prefill costs a full weight pass; batching k prompts
        amortizes it exactly like batched decode).  Prompts left-pad to a
        common bucket via the processor's batch path (reference
        Phi3FProcessor semantics), run one ``run_prefill``, and each row
        becomes its own :class:`_Prepared` carrying ``src_row`` into the
        shared ``src_state`` — adoption slices its row on device.

        ``opts[i]``: per-request dict of prepare()'s keyword arguments.
        """
        from .engine import round_up, run_prefill
        from .stream import validate_stops

        assert len(prompts) == len(opts)
        if len(prompts) == 1:
            return [self.prepare(prompts[0], **opts[0])]
        dict_input = self.processor(list(prompts))
        ids = np.asarray(dict_input["input_ids"])
        mask = np.asarray(
            dict_input.get("mask")
            if dict_input.get("mask") is not None
            else np.ones_like(ids)
        )
        l = int(ids.shape[1])
        l_guess = max(round_up(l, 64), 64)
        if l_guess >= self.window:
            raise ValueError(
                f"batched prompts ({l_guess} tokens bucketed) do not fit "
                f"window {self.window}"
            )
        logits, src_state, l_pad, src_window = run_prefill(
            self.lm, dict_input, max_tokens=self.window - l_guess
        )
        assert src_window == self.window, (src_window, self.window)
        if self.async_admission:
            firsts, firsts_dev = None, jnp.argmax(
                jnp.asarray(logits), axis=-1
            ).astype(jnp.int32)
        else:
            firsts, firsts_dev = np.argmax(
                np.asarray(jax.device_get(logits)), axis=-1
            ), None
        out = []
        for r, o in enumerate(opts):
            real = ids[r][mask[r].astype(bool)]
            out.append(_Prepared(
                src_state=src_state, src_row=r,
                first=_FIRST_PENDING if firsts is None else int(firsts[r]),
                first_dev=firsts_dev,
                l_pad=l_pad, n_pads=l_pad - len(real),
                prompt_ids=[int(t) for t in real],
                max_tokens=o.get("max_tokens", 512),
                temperature=o.get("temperature", 0.0),
                top_p=o.get("top_p", 1.0), top_k=o.get("top_k", 0),
                min_p=o.get("min_p", 0.0),
                stop=validate_stops(o.get("stop")),
                early_stop=o.get("early_stop", False),
            ))
        return out

    def can_admit(self, prepared: _Prepared) -> bool:
        return bool(self.free)

    def _adopt_prepared(self, p: _Prepared, slot: int) -> None:
        """Device-state adoption only (subclasses add page accounting)."""
        key = (p.l_pad, p.src_state.valid.shape[0])
        if key not in self._adopt_fns:
            cfg = self.lm.cfg
            self._adopt_fns[key] = jax.jit(
                lambda t, slot, src, tok, pads, prow, srow, _l=p.l_pad: _adopt(
                    cfg, SlotState.from_tree(t), slot, src, tok, _l, pads,
                    prompt_row=prow, src_row=srow,
                ).tree()
            )
        prow = np.zeros((p.l_pad,), np.int32)
        seed_ids = p.ids if p.ids is not None else p.prompt_ids
        prow[p.n_pads:] = np.maximum(np.asarray(seed_ids, np.int32), 0)
        self.state = SlotState.from_tree(
            self._adopt_fns[key](
                self.state.tree(), jnp.asarray(slot, jnp.int32), p.src_state,
                _first_arg(p), jnp.asarray(p.n_pads, jnp.int32),
                jnp.asarray(prow), jnp.asarray(p.src_row, jnp.int32),
            )
        )

    def admit(self, prepared: _Prepared) -> int:
        """Adopt a prepared prefill into a free slot (mutates engine state —
        the scheduler calls this under its lock)."""
        if not self.free:
            raise RuntimeError("no free slots; call step() until one frees")
        p = prepared
        slot = self.free.pop()
        try:
            self._adopt_prepared(p, slot)
        except Exception:
            self.free.append(slot)
            # release any per-slot resources a subclass already attached
            # (e.g. the paged engine's freshly allocated pages)
            self._on_slot_freed(slot)
            raise
        if p.rid >= 0:
            rid = p.rid  # preemption resume keeps the original request
            req = self.requests[rid]
            req.slot = slot
            req.l_pad = p.l_pad
            # p.first is the request's pending token (tokens[-1]), re-seeded
            # into the slot by _adopt — not a new emission.
            req.adopted_at = len(req.tokens)
        else:
            rid = self._next_rid
            self._next_rid += 1
            req = _Request(
                rid=rid, slot=slot, tokens=[p.first], max_tokens=p.max_tokens,
                l_pad=p.l_pad, temperature=p.temperature, top_p=p.top_p,
                top_k=p.top_k, min_p=p.min_p, stop=p.stop,
                prompt_ids=p.prompt_ids, has_images=p.has_images,
            )
            if p.first_dev is not None:
                req.first_dev, req.first_row = p.first_dev, p.src_row
            if p.early_stop:
                from .stream import LogitStopper

                req.stopper = LogitStopper(p.max_tokens, p.early_stop)
            self.requests[rid] = req
        # Async-admitted requests defer the first-token EOS/stop checks to
        # _materialize_first (their value is still on device); max_tokens is
        # a host-known count and stays immediate.
        done_now = len(req.tokens) >= req.max_tokens
        if req.first_dev is None:
            done_now = done_now or p.first == self.lm.eos_id or self._stop_hit(req)
        if done_now:
            req.done = True
            self.free.append(slot)
            self._on_slot_freed(slot)
        else:
            self.by_slot[slot] = req
        return rid

    def submit(self, prompt: str, max_tokens: int = 512,
               temperature: float = 0.0, top_p: float = 1.0,
               top_k: int = 0, min_p: float = 0.0, stop=None,
               early_stop=False, images=None) -> int:
        return self.admit(self.prepare(
            prompt, max_tokens, temperature=temperature, top_p=top_p,
            top_k=top_k, min_p=min_p, stop=stop, early_stop=early_stop,
            images=images,
        ))

    def _stop_hit(self, req) -> bool:
        """True when the request's decoded generation contains a stop
        string (text-level matching — stop strings spanning token
        boundaries still fire; ``result`` trims at the occurrence).
        Decodes only a token tail (:func:`stream.stop_tail_window`) so
        per-token host work inside the pump stays O(1) in generation
        length instead of O(n)."""
        if not req.stop:
            return False
        tail = req.tokens[-stop_tail_window(req.stop) :]
        # an async-admitted first token may still be the pending sentinel
        txt = self.processor.tokenizer.decode([t for t in tail if t >= 0])
        return any(s in txt for s in req.stop)

    def _materialize_first(self, req, value: Optional[int] = None) -> None:
        """Resolve an async-admitted request's first token.

        ``value`` comes free with a chunk fetch (the dispatch-time seed
        snapshot); without one this blocks on a tiny device_get — only host
        paths that need the text (tokens()/result(), resume) pay that.
        Runs the EOS/stop first-token checks admit() deferred."""
        if req.first_dev is None:
            return
        if value is None:
            value = int(
                np.asarray(jax.device_get(req.first_dev))[req.first_row]
            )
        req.tokens[0] = int(value)
        req.first_dev = None
        if req.done:
            return
        if req.tokens[0] == self.lm.eos_id or self._stop_hit(req):
            req.done = True
            slot = req.slot
            if self.by_slot.get(slot) is req:
                del self.by_slot[slot]
                self.free.append(slot)
                self._on_slot_freed(slot)

    # -- decode -------------------------------------------------------------

    def pending(self) -> bool:
        return bool(self.by_slot) or bool(self._inflight)

    def _sampling_vectors(self):
        """(temps, top_ps, top_ks, min_ps) device vectors, or Nones when
        all-greedy (top-k/min-p only act on sampled rows)."""
        if all(r.temperature <= 0 for r in self.by_slot.values()):
            return None, None, None, None
        temps = np.zeros((self.slots,), np.float32)
        tops = np.ones((self.slots,), np.float32)
        topks = np.zeros((self.slots,), np.int32)
        minps = np.zeros((self.slots,), np.float32)
        for slot, req in self.by_slot.items():
            temps[slot] = req.temperature
            tops[slot] = req.top_p
            topks[slot] = req.top_k
            minps[slot] = req.min_p
        return (jnp.asarray(temps), jnp.asarray(tops), jnp.asarray(topks),
                jnp.asarray(minps))

    def _try_resume(self) -> None:
        """Hook: the paged subclass resumes preempted requests here."""

    def _reserve(self, n_steps: int, use_spec: bool) -> bool:
        """Hook: make room for one chunk's worst-case cache growth (paged
        subclass).  False aborts the dispatch (nothing steppable)."""
        return True

    def _plain_fn(self, n_steps: int, sampling: bool):
        """Compiled vanilla chunk (subclasses swap the state/step impl)."""
        fkey = (n_steps, sampling)
        if fkey not in self._step_fns:
            cfg, eos_id = self.lm.cfg, self.lm.eos_id

            def f(params, tree, active, temps, tops, topks, minps, key,
                  _n=n_steps, _s=sampling):
                toks, maxlp, eoslp, st = _decode_chunk(
                    params, cfg, SlotState.from_tree(tree), active, _n,
                    temps=temps if _s else None,
                    top_ps=tops if _s else None,
                    top_ks=topks if _s else None,
                    min_ps=minps if _s else None, key=key, eos_id=eos_id,
                )
                return toks, maxlp, eoslp, st.tree()

            self._step_fns[fkey] = jax.jit(f, donate_argnums=(1,))
        return self._step_fns[fkey]

    def dispatch(self, n_steps: int = 1):
        """Enqueue one decode chunk WITHOUT waiting for its results.

        Returns a :class:`_ChunkHandle` for :meth:`collect`, or None when
        nothing is active.  The handle snapshots slot->rid at enqueue time,
        so collect() stays correct even if slots free and re-admit while the
        chunk is in flight (their trailing steps are discarded).
        """
        self._try_resume()
        if not self.by_slot:
            return None
        temps, tops, topks, minps = self._sampling_vectors()
        self._tail_slots &= set(self.by_slot)
        use_spec = bool(self.spec_k
                        and (self.spec_uniform or not self._tail_slots))
        if not self._reserve(n_steps, use_spec):
            return None
        if use_spec:
            return self._dispatch_spec(n_steps, (temps, tops, topks, minps))
        sampling = temps is not None
        fn = self._plain_fn(n_steps, sampling)
        active = np.zeros((self.slots,), bool)
        for slot in self.by_slot:
            active[slot] = True
        seed = self._seed_snapshot()
        self._chunk_i += 1
        toks, maxlp, eoslp, tree = fn(
            self.lm.params, self.state.tree(), jnp.asarray(active),
            temps if sampling else jnp.zeros((self.slots,), jnp.float32),
            tops if sampling else jnp.ones((self.slots,), jnp.float32),
            topks if sampling else jnp.zeros((self.slots,), jnp.int32),
            minps if sampling else jnp.zeros((self.slots,), jnp.float32),
            jax.random.fold_in(self._base_key, self._chunk_i),
        )
        self.state = type(self.state).from_tree(tree)
        return _ChunkHandle(
            "plain", (toks, maxlp, eoslp),
            {s: r.rid for s, r in self.by_slot.items()}, n_steps,
            growth=n_steps, seed=seed,
        )

    def _seed_snapshot(self):
        """Device copy of per-slot seed tokens, taken BEFORE the step fn
        donates the state tree — carries async-admitted first tokens home
        with the chunk fetch.  None when no slot has one pending."""
        if not any(r.first_dev is not None for r in self.by_slot.values()):
            return None
        return jnp.copy(self.state.tokens)

    def collect(self, handle) -> Dict[int, List[int]]:
        """Fetch a dispatched chunk's results and trim them into requests.

        Blocks until the chunk finishes on device.  Steps belonging to slots
        whose request completed (or was preempted) after the dispatch are
        discarded — a pipelined caller wastes at most one chunk per request.
        Returns {rid: [tokens...]} including any tokens trimmed by internal
        flushes since the last collect.
        """
        if handle is not None and any(h is handle for h in self._inflight):
            self._inflight = [h for h in self._inflight if h is not handle]
        out, self._orphan_out = self._orphan_out, {}
        if handle is None:
            return out
        if handle.kind == "spec":
            return self._collect_spec(handle, out)
        # one transfer: chunk results + the dispatch-time seed snapshot
        (toks, maxlp, eoslp), seed = jax.device_get(
            (handle.arrays, handle.seed)
        )  # toks: (n_steps, S)
        for slot, rid in handle.slot_rids.items():
            req = self.requests[rid]
            if req.first_dev is not None and seed is not None \
                    and req.slot == slot:
                # FIFO collection: the first collected chunk covering this
                # slot is the first chunk dispatched after adoption, whose
                # seed snapshot holds exactly the adopted first token.
                self._materialize_first(req, value=int(seed[slot]))
            if req.done or req.slot != slot:
                continue  # finished/preempted while this chunk was in flight
            emitted = out.setdefault(rid, [])
            for i in range(handle.n_steps):
                tok = int(toks[i, slot])
                req.tokens.append(tok)
                emitted.append(tok)
                hit_window = (
                    req.l_pad + len(req.tokens) - req.adopted_at + 1
                    >= self.window - 1
                )
                early = req.stopper is not None and req.stopper.update(
                    float(maxlp[i, slot]), float(eoslp[i, slot]), 1
                )
                if (
                    early
                    or tok == self.lm.eos_id
                    or len(req.tokens) >= req.max_tokens
                    or hit_window
                    or self._stop_hit(req)
                ):
                    req.done = True
                    # _project_completions may have freed (and admission
                    # re-filled) the slot before this chunk was collected —
                    # only do the slot bookkeeping if we still own it.
                    if self.by_slot.get(slot) is req:
                        del self.by_slot[slot]
                        self.free.append(slot)
                        self._on_slot_freed(slot)
                    break
        return out

    def flush(self) -> Dict[int, List[int]]:
        """Collect ALL in-flight pipelined chunks, oldest first."""
        out = self.collect(None)  # drains orphaned tokens
        while self._inflight:
            h = self._inflight.pop(0)
            for rid, toks in self.collect(h).items():
                out.setdefault(rid, []).extend(toks)
        return out

    def _pending_growth(self) -> int:
        """Worst-case cache-column growth of every uncollected chunk."""
        return sum(h.growth for h in self._inflight)

    def step(self, n_steps: int = 1) -> Dict[int, List[int]]:
        """``n_steps`` decode steps (one dispatch) for all active slots.

        Returns {rid: [tokens...]} (EOS/max_tokens-trimmed).  Requests join
        and complete at chunk boundaries; a slot finishing mid-chunk wastes
        the chunk remainder only.  With ``spec_k`` set and an all-greedy
        batch, each step is a speculative verify pass (1..K+1 tokens/slot).
        """
        out = self.flush()  # no-op unless mixed with step_pipelined
        h = self.dispatch(n_steps)
        if h is not None:
            for rid, toks in self.collect(h).items():
                out.setdefault(rid, []).extend(toks)
        return out

    def step_pipelined(self, n_steps: int = 1,
                       depth: Optional[int] = None) -> Dict[int, List[int]]:
        """One pipelined tick: enqueue the NEXT chunk before collecting the
        previous one.

        The device runs chunk k+1 while the host fetches chunk k's tokens,
        trims, and runs any admission prefills the caller interleaves —
        hiding the per-chunk dispatch+fetch latency.  ``depth`` (default:
        the engine's ``pipeline_depth``) sets how many chunks stay in
        flight: once the pipe fills, per-tick wall time approaches the
        device execute time instead of the dispatch+fetch round trip
        (~0.8 s through a contended remote tunnel).  Cost: request
        completion is detected up to ``depth`` chunks late, so each request
        wastes at most ``depth`` chunks of device steps (the stale tokens
        are discarded; the freed slot's cache columns are reset at the next
        adoption).  Call :meth:`flush` after the loop to collect the final
        chunk(s).
        """
        if depth is None:
            depth = self.pipeline_depth
        h = self.dispatch(n_steps)  # may internally flush under pool pressure
        if h is not None:
            self._inflight.append(h)
            self._project_completions()
        if len(self._inflight) > depth or (h is None and self._inflight):
            return self.collect(self._inflight.pop(0))
        return self.collect(None)  # still drains orphaned tokens

    def _project_completions(self) -> None:
        """Free slots whose requests are GUARANTEED to finish within the
        chunks already in flight, without waiting for collect().

        With depth-``d`` pipelining, completion is normally detected up to
        ``d`` chunks late, so a finished request wastes up to ``d * chunk``
        device steps before its slot re-admits.  Two finish conditions are
        deterministic in the emission count and therefore predictable at
        dispatch time: ``max_tokens`` and the window bound.  When the steps
        already scheduled across in-flight PLAIN chunks cover the remaining
        budget, the slot is returned to ``free`` immediately — admission
        refills it at the next chunk boundary while the old request's
        remaining tokens still arrive through collect() (which skips the
        slot bookkeeping when the slot has moved on).

        LEGACY spec chunks are excluded from the scheduled count: a tail
        slot can emit ZERO tokens from a verify pass (window too tight for
        a worst-case pass), so ``n_steps`` passes bound emissions only for
        plain chunks.  UNIFORM spec chunks count: forced-reject rows keep
        every live slot emitting >= 1 token per pass until a finish bound
        trips, so ``n_passes`` is a valid lower bound on emissions too.
        EOS / stop strings / early_stop can only finish a request EARLIER
        than the projected bound, which is fine — the slot is free either
        way by the time the projection's chunks drain.
        """
        scheduled: Dict[int, int] = {}
        for h in self._inflight:
            if h.kind != "plain" and not (h.kind == "spec"
                                          and self.spec_uniform):
                continue
            for slot, rid in h.slot_rids.items():
                if self.by_slot.get(slot) is self.requests[rid]:
                    scheduled[slot] = scheduled.get(slot, 0) + h.n_steps
        for slot, n in scheduled.items():
            req = self.by_slot[slot]
            # emissions until max_tokens trips (collect appends then checks)
            j_max = req.max_tokens - len(req.tokens)
            # emissions until hit_window trips:
            #   l_pad + (len+j) - adopted_at + 1 >= window - 1
            j_win = (self.window - 2) - req.l_pad - len(req.tokens) \
                + req.adopted_at
            if n >= min(j_max, j_win):
                del self.by_slot[slot]
                self.free.append(slot)
                self._on_slot_freed(slot)

    def _spec_fn(self, n_passes: int, sampling: bool):
        """Compiled speculative chunk (subclasses swap the state/step impl)."""
        uniform = self.spec_uniform
        fkey = ("spec", n_passes, self.spec_k, sampling, uniform)
        if fkey not in self._step_fns:
            cfg, eos_id = self.lm.cfg, self.lm.eos_id

            def f(params, tree, active, temps, tops, topks, minps, key,
                  spec_ok, _n=n_passes, _k=self.spec_k, _s=sampling,
                  _u=uniform):
                toks, maxlp, eoslp, n_emits, st = _spec_decode_chunk(
                    params, cfg, SlotState.from_tree(tree), active, _n, _k,
                    eos_id=eos_id,
                    temps=temps if _s else None,
                    top_ps=tops if _s else None,
                    top_ks=topks if _s else None,
                    min_ps=minps if _s else None, key=key,
                    spec_ok=spec_ok if _u else None,
                )
                return toks, maxlp, eoslp, n_emits, st.tree()

            self._step_fns[fkey] = jax.jit(f, donate_argnums=(1,))
        return self._step_fns[fkey]

    def _dispatch_spec(self, n_passes: int, sampling_vecs=None):
        """Enqueue a speculative chunk: ``n_passes`` verify passes."""
        temps, tops, topks, minps = sampling_vecs or (None,) * 4
        sampling = temps is not None
        fn = self._spec_fn(n_passes, sampling)
        active = np.zeros((self.slots,), bool)
        for slot in self.by_slot:
            active[slot] = True
        seed = self._seed_snapshot()
        self._chunk_i += 1
        spec_ok = jnp.full((self.slots,), self.spec_accept, bool)
        toks, maxlp, eoslp, n_emits, tree = fn(
            self.lm.params, self.state.tree(), jnp.asarray(active),
            temps if sampling else jnp.zeros((self.slots,), jnp.float32),
            tops if sampling else jnp.ones((self.slots,), jnp.float32),
            topks if sampling else jnp.zeros((self.slots,), jnp.int32),
            minps if sampling else jnp.zeros((self.slots,), jnp.float32),
            jax.random.fold_in(self._base_key, self._chunk_i),
            spec_ok,
        )
        self.state = type(self.state).from_tree(tree)
        return _ChunkHandle(
            "spec", (toks, maxlp, eoslp, n_emits),
            {s: r.rid for s, r in self.by_slot.items()}, n_passes,
            growth=n_passes * (self.spec_k + 1), seed=seed,
        )

    def _collect_spec(self, handle, out) -> Dict[int, List[int]]:
        (toks, maxlp, eoslp, n_emits), seed = jax.device_get(
            (handle.arrays, handle.seed)
        )  # toks: (n_passes, S, K+1)
        n_passes = handle.n_steps
        for slot, rid in handle.slot_rids.items():
            req = self.requests[rid]
            if req.first_dev is not None and seed is not None \
                    and req.slot == slot:
                self._materialize_first(req, value=int(seed[slot]))
            if req.done or req.slot != slot:
                continue  # finished/preempted while this chunk was in flight
            emitted = out.setdefault(rid, [])
            done = False
            any_emitted = False
            for i in range(n_passes):
                m = int(n_emits[i, slot])
                if m:
                    any_emitted = True
                    self.spec_stats["passes"] += 1
                    self.spec_stats["emitted"] += m
                for p in range(m):
                    tok = int(toks[i, slot, p])
                    req.tokens.append(tok)
                    emitted.append(tok)
                    hit_window = (
                        req.l_pad + len(req.tokens) - req.adopted_at + 1
                        >= self.window - 1
                    )
                    early = req.stopper is not None and req.stopper.update(
                        float(maxlp[i, slot, p]), float(eoslp[i, slot, p]), 1
                    )
                    if (
                        early
                        or tok == self.lm.eos_id
                        or len(req.tokens) >= req.max_tokens
                        or hit_window
                        or self._stop_hit(req)
                    ):
                        done = True
                        break
                if done:
                    break
            if done:
                req.done = True
                if self.by_slot.get(slot) is req:  # see collect()
                    del self.by_slot[slot]
                    self.free.append(slot)
                    self._on_slot_freed(slot)
            elif not any_emitted:
                if self.spec_uniform:
                    # Uniform dispatch keeps tail slots live until the
                    # window is TRULY full (forced-reject rows emit one
                    # token per pass) — zero emissions means no columns
                    # left: finalize as window-full.
                    req.done = True
                    if self.by_slot.get(slot) is req:
                        del self.by_slot[slot]
                        self.free.append(slot)
                        self._on_slot_freed(slot)
                else:
                    # A live slot always emits >= 1 token per pass, so a
                    # zero-token chunk means the window cannot absorb
                    # another worst-case pass: decode this slot's tail
                    # through the vanilla step so its stream stays
                    # bit-identical (step() switches paths while any tail
                    # slot is active).
                    self._tail_slots.add(slot)
        return out

    def _on_slot_freed(self, slot: int) -> None:
        """Hook for subclasses (page accounting)."""

    def fail_all_active(self, message: str) -> None:
        """Fail every in-flight request and reset device state.

        The scheduler pump calls this when ``step`` raises unexpectedly: the
        error is surfaced on each owning request (``result`` re-raises it)
        instead of killing the pump thread, and the engine restarts clean.
        """
        for slot, req in list(self.by_slot.items()):
            req.error = message
            req.done = True
        # Requests proactively freed by _project_completions are no longer
        # in by_slot but still owe tokens to in-flight chunks — fail them
        # too, or their result() would wait forever.
        for h in self._inflight:
            for rid in h.slot_rids.values():
                req = self.requests[rid]
                if not req.done:
                    req.error = message
                    req.done = True
        self.by_slot.clear()
        self.free = list(range(self.slots))
        for slot in range(self.slots):
            self._on_slot_freed(slot)
        self._inflight = []  # their results belong to the failed requests
        self._orphan_out = {}
        self.state = self._init_state()

    # -- results ------------------------------------------------------------

    def first_token(self, rid: int) -> int:
        """The request's first (prefill-argmax) token.

        Under async admission this is the one host read that may block on a
        tiny device fetch; streaming callers that want the first token before
        any step() use this instead of peeking at ``requests[rid].tokens``."""
        req = self.requests[rid]
        self._materialize_first(req)
        return req.tokens[0]

    def tokens(self, rid: int) -> List[int]:
        """Raw generated token ids (EOS-trimmed)."""
        req = self.requests[rid]
        if req.error:
            raise RuntimeError(f"request {rid} failed: {req.error}")
        self._materialize_first(req)
        toks = req.tokens
        if self.lm.eos_id in toks:
            toks = toks[: toks.index(self.lm.eos_id)]
        return list(toks)

    def result(self, rid: int) -> str:
        txt = self.processor.tokenizer.decode(self.tokens(rid))
        req = self.requests[rid]
        if req.stop:
            cuts = [txt.find(s) for s in req.stop if s in txt]
            if cuts:
                txt = txt[: min(cuts)]
        return txt
