"""Prompt-lookup speculative decoding: greedy-exact, draft-model-free.

Single-stream decode on TPU is HBM-bound — every generated token pays one
full read of the (quantized) weights, so greedy decode caps near the
weight-payload speed of light no matter how fast the MXU is.  Speculative
decoding breaks that bound: verify K drafted tokens in ONE forward pass
(an lq = K+1 chunk reads the weights once) and emit 1..K+1 tokens per
weight pass.  Drafts come from n-gram continuation lookup over the tokens
already in the window ("prompt lookup" — no draft model), which is strong
whenever generation echoes the context: summarization, extraction, RAG,
code edits, constrained form-filling.

Exactness: greedy acceptance is argmax-match, so the emitted stream is
bit-identical to vanilla greedy decode (the reference's only decode mode,
/root/reference/phi_3_vision_mlx.py:386).  Sampled decode composes via
rejection-sampling verification (:func:`verify_sampled`) — each emitted
token is distributed exactly as vanilla sampling from the filtered target.
The reference has no speculative path; this is a beyond-parity TPU feature.

TPU-native mechanics (everything inside one ``lax.scan``; the host sees
only token ids + per-position logit stats):

* the token history lives in a device buffer aligned slot-for-slot with
  the KV cache window (slot p holds the token whose KV sits at column p);
* proposal is a vectorized 3->2->1-gram match over the committed window
  (one compare+argmax sweep, no host round-trip);
* verification is ``decode_forward(advance=0)`` + a traced offset bump of
  ``accepted+1``.  Stale cache columns beyond the committed offset are
  already invisible (``key_pos <= q_pos`` masking, models/phi3.py) and
  the next iteration's chunk write covers them, so rollback is free.

Restricted to batch 1 (the cache offset is a shared scalar) — exactly the
single-stream case the technique accelerates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..models import phi3


def propose_drafts(buf, valid, tok, off, k_draft: int):
    """N-gram continuation lookup over the committed window.

    buf: (B, W) int32 token history (slot p = token at cache column p).
    valid: (B, W) bool key validity (False at left-pad columns).
    tok: (B, 1) the pending token (input of the next decode step).
    off: () or (B,) int32 committed offset(s) — the slot engines pass a
    per-row vector (engine/batching.py), the single-stream engine a scalar.

    Finds the most recent position j whose trailing n-gram (n = 3, then 2,
    then 1) matches the sequence ending at ``tok`` and returns the K tokens
    that followed it, clamped to the committed region.  No match is fine —
    the drafts simply won't be accepted.
    """
    b, w = buf.shape
    idx = jnp.arange(w, dtype=jnp.int32)
    off = jnp.broadcast_to(jnp.asarray(off, jnp.int32), (b,))
    # j must leave at least one committed continuation token: j <= off - 2.
    committed = valid & (idx[None, :] <= off[:, None] - 2)
    t0 = tok[:, 0]
    rows = jnp.arange(b)
    prev1 = buf[rows, jnp.maximum(off - 1, 0)]
    prev2 = buf[rows, jnp.maximum(off - 2, 0)]
    r1 = jnp.roll(buf, 1, axis=1)
    r2 = jnp.roll(buf, 2, axis=1)
    m1 = (buf == t0[:, None]) & committed
    m2 = m1 & (r1 == prev1[:, None]) & (idx[None, :] >= 1)
    m3 = m2 & (r2 == prev2[:, None]) & (idx[None, :] >= 2)

    def best(m):
        return m.any(axis=1), jnp.where(m, idx[None, :], -1).max(axis=1)

    has3, j3 = best(m3)
    has2, j2 = best(m2)
    has1, j1 = best(m1)
    j = jnp.where(has3, j3, jnp.where(has2, j2, j1))
    base = jnp.where(has3 | has2 | has1, j + 1, 0)
    pos = jnp.clip(
        base[:, None] + jnp.arange(k_draft, dtype=jnp.int32)[None, :],
        0,
        jnp.maximum(off - 1, 0)[:, None],
    )
    # Clamp ids at 0: vision prompts keep negative placeholder ids in the
    # history buffer (their cache columns hold image embeddings); they must
    # never reach the embedding table.
    return jnp.maximum(jnp.take_along_axis(buf, pos, axis=1), 0)


def verify_sampled(logits, draft, key, temperature: float, top_p: float,
                   top_k: int = 0, min_p: float = 0.0):
    """Rejection-sampling verification of drafted tokens (Leviathan-style,
    specialized to a DETERMINISTIC draft proposal q = delta(d_t)):

    * accept draft ``d_t`` with probability ``p_t(d_t)`` (``min(1, p/q)``
      with q=1 at the draft token);
    * on the first rejection, resample from the residual
      ``(p - q)+ / Z`` — i.e. ``p_t`` with ``d_t`` masked out, renormalized;
    * if every draft is accepted, sample the bonus token from ``p_K``.

    Each emitted token is distributed EXACTLY as token-by-token sampling
    from the filtered target distribution (tests/test_speculative.py runs
    the empirical-distribution check).

    logits: (B, K+1, V) f32 raw target logits at the drafted positions;
    draft: (B, K) int32.  Returns (out (B, K+1) int32, n_emit (B,) int32)
    with out[:, t] = draft[:, t] for t < acc and out[:, acc] the
    resampled/bonus token — the same layout the greedy path emits.
    """
    from .engine import filter_sample_logits

    b, kp1, _ = logits.shape
    k = kp1 - 1
    f = filter_sample_logits(logits, temperature, top_p, top_k, min_p)
    probs = jax.nn.softmax(f, axis=-1)  # (B, K+1, V)
    kd, kr, kb = jax.random.split(key, 3)
    p_draft = jnp.take_along_axis(probs[:, :k], draft[..., None], axis=-1)[..., 0]
    accept = jax.random.uniform(kd, (b, k)) < p_draft
    acc = jnp.cumprod(accept.astype(jnp.int32), axis=1).sum(axis=1)  # (B,)
    # residual: target with the (rejected) draft token removed, renormalized
    res_logits = jnp.where(
        jax.nn.one_hot(draft, f.shape[-1], dtype=bool), -jnp.inf, f[:, :k]
    )
    resample = jax.random.categorical(kr, res_logits, axis=-1).astype(jnp.int32)
    bonus = jax.random.categorical(kb, f[:, k], axis=-1).astype(jnp.int32)
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    out = jnp.where(pos < acc[:, None], draft, resample)
    out = jnp.concatenate([out, bonus[:, None]], axis=1)
    return out, acc + 1


def verify_mixed_rows(logits, draft, key, temps, top_ps, top_ks, min_ps):
    """Per-row verification for the slot engines: rows with ``temps <= 0``
    use greedy argmax-match acceptance; sampled rows use rejection-sampling
    verification against their own filtered target (the per-row analogue of
    :func:`verify_sampled`).

    logits: (S, K+1, V) f32; draft: (S, K) int32; knobs: (S,) vectors.
    Returns (out (S, K+1) int32, acc (S,) int32).
    """
    from .engine import filter_sample_logits_rows

    s, kp1, _ = logits.shape
    k = kp1 - 1
    out_g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    match = (draft == out_g[:, :-1]).astype(jnp.int32)
    acc_g = jnp.cumprod(match, axis=1).sum(axis=1)

    f = filter_sample_logits_rows(logits, temps, top_ps, top_ks, min_ps)
    probs = jax.nn.softmax(f, axis=-1)
    kd, kr, kb = jax.random.split(key, 3)
    p_draft = jnp.take_along_axis(probs[:, :k], draft[..., None], axis=-1)[..., 0]
    accept = jax.random.uniform(kd, (s, k)) < p_draft
    acc_s = jnp.cumprod(accept.astype(jnp.int32), axis=1).sum(axis=1)
    res_logits = jnp.where(
        jax.nn.one_hot(draft, f.shape[-1], dtype=bool), -jnp.inf, f[:, :k]
    )
    resample = jax.random.categorical(kr, res_logits, axis=-1).astype(jnp.int32)
    bonus = jax.random.categorical(kb, f[:, k], axis=-1).astype(jnp.int32)
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    out_s = jnp.concatenate(
        [jnp.where(pos < acc_s[:, None], draft, resample), bonus[:, None]],
        axis=1,
    )
    sampled_row = temps > 0
    out = jnp.where(sampled_row[:, None], out_s, out_g)
    acc = jnp.where(sampled_row, acc_s, acc_g)
    return out, acc


def spec_chunk_fn(lm, window: int, n_iters: int, k_draft: int, sampler=None):
    """Compiled speculative-decode scan: up to ``n_iters`` verify steps per
    device call, each emitting 1..K+1 tokens.

    The scan self-limits on device (``lax.cond`` skips the forward once the
    budget or the window is exhausted), so dispatches can be sized like the
    vanilla 256-step decode chunks — per-dispatch host/tunnel overhead is
    what dominates small chunks, not the verify passes themselves.

    ``sampler``: None for greedy (argmax-match acceptance, bit-identical to
    vanilla greedy), or (temperature, top_p, top_k, min_p) for
    rejection-sampled verification (:func:`verify_sampled`) whose emitted
    stream is distributed exactly as vanilla sampling.

    Returns fn(params, token (1,1), state, buf, budget (), key) ->
      (token, state, buf, toks (n, 1, K+1), maxlp, eoslp, n_emits (n,)).
    ``n_emits[i] == 0`` marks skipped iterations (budget/window exhausted).
    """
    cfg, eos_id = lm.cfg, lm.eos_id

    def build():
        def f(params, token, state, buf, budget, key):
            zero_stats = (
                jnp.zeros((1, k_draft + 1), jnp.int32),
                jnp.zeros((1, k_draft + 1), jnp.float32),
                jnp.zeros((1, k_draft + 1), jnp.float32),
                jnp.zeros((), jnp.int32),
            )

            def skip(carry):
                return carry, zero_stats

            def step(carry):
                tok, st, hist, left, k_it = carry
                off = st.offset
                draft = propose_drafts(hist, st.valid, tok, off, k_draft)
                ids = jnp.concatenate([tok, draft], axis=1)  # (1, K+1)
                hist = lax.dynamic_update_slice(hist, ids, (0, off))
                res = phi3.decode_forward(
                    params, cfg, st, input_ids=ids, advance=0
                )
                logits = res.logits.astype(jnp.float32)  # (1, K+1, V)
                k_it, k_use = jax.random.split(k_it)
                if sampler is None:
                    out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    match = (draft == out[:, :-1]).astype(jnp.int32)
                    acc = jnp.cumprod(match, axis=1).sum(axis=1)  # (1,)
                    n_emit = acc[0] + 1
                else:
                    out, n_emits_row = verify_sampled(
                        logits, draft, k_use, *sampler
                    )
                    acc = n_emits_row - 1
                    n_emit = n_emits_row[0]
                st = res.state._replace(offset=off + n_emit)
                lp = jax.nn.log_softmax(logits, axis=-1)
                nxt = jnp.take_along_axis(out, acc[:, None], axis=1)
                stats = (out, lp.max(axis=-1), lp[..., eos_id], n_emit)
                return (nxt, st, hist, left - n_emit, k_it), stats

            def body(carry, _):
                _, st, _, left, _ = carry
                live = (left > 0) & (st.offset + k_draft + 1 <= window)
                return lax.cond(live, step, skip, carry)

            (tok_f, st_f, buf_f, _, _), (toks, maxlp, eoslp, n_emits) = lax.scan(
                body, (token, state, buf, budget, key), None, length=n_iters
            )
            return tok_f, st_f, buf_f, toks, maxlp, eoslp, n_emits

        return f

    return lm._fn(
        ("spec_chunk", window, n_iters, k_draft, sampler), build, donate=(2, 3)
    )


def init_token_buffer(ids_padded, window: int):
    """(B, l_pad) padded prompt ids -> (B, window) int32 history buffer."""
    ids = jnp.asarray(ids_padded, jnp.int32)
    b, l_pad = ids.shape
    return jnp.concatenate(
        [ids, jnp.zeros((b, window - l_pad), jnp.int32)], axis=1
    )
