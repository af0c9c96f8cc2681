"""Generation engine: jitted prefill + chunked decode over a DecodeState.

The reference decode loop (/root/reference/phi_3_vision_mlx.py:376-409) pays
one lazy-graph sync per generated token (``mx.eval`` at :387,:393).  The TPU
engine instead:

* compiles one **prefill** function per (batch, prompt-bucket, window) and
  one **decode-chunk** function per (batch, window, chunk) — prompt lengths
  are bucketed (left-padding more, which is exactly the reference's batch
  padding semantics, phi.py:233-245) so a handful of compilations serve all
  prompts;
* decodes ``CHUNK`` tokens per device call with an on-device ``lax.scan``
  (argmax feeding back), returning the tokens plus the per-step logit
  statistics the host-side stoppers need — dispatch overhead is amortized
  ``CHUNK``-fold and the host never sees full logits;
* donates the DecodeState so XLA updates the KV cache in place.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.config import ID_EOS, ModelConfig
from ..models import phi3
from ..utils.timing import Tic
from .stream import LogitStopper, StopSequences, Streamer, TokenStopper

import os

PROMPT_BUCKET = 64
WINDOW_BUCKET = 128  # window sizes stay block-friendly for the Pallas cache kernels
# Decode runs CHUNK steps per device call (an on-device lax.scan).  Big
# chunks amortize dispatch overhead but waste steps after EOS and delay
# streaming; small chunks do the opposite.  The loop therefore RAMPS: start
# at PHI3V_TPU_DECODE_CHUNK_MIN (fast first tokens, cheap early-EOS exits)
# and grow 4x per call up to PHI3V_TPU_DECODE_CHUNK (steady-state
# throughput).  The ramp visits only log4(max/min) sizes, so a handful of
# compilations serve any run.  Read at call time so server and bench can
# pick different schedules in one process.


def _chunk_schedule():
    mx = int(os.environ.get("PHI3V_TPU_DECODE_CHUNK", "256"))
    mn = min(int(os.environ.get("PHI3V_TPU_DECODE_CHUNK_MIN", "8")), mx)
    return mn, mx
# Long prompts prefill in chunks of this many tokens.  Each chunk pays one
# full weight pass (the XLA prefill path dequantizes per layer), so bigger
# chunks amortize weight traffic: 32K-prompt prefill measured 560 tok/s at
# 512-token chunks -> 1549 @ 2048 -> 2155 @ 4096 -> 2633 @ 8192 -> 3902
# @ 16384 -> 4315 @ 32768 (one-shot; with the r3 (1024, 2048) flash tiles).
# Default 16384: verified to still fit beside the 48K-window quantized
# cache on the ~8 GB fraction; set 32768 when windows stay <= 32K.
PREFILL_CHUNK = int(os.environ.get("PHI3V_TPU_PREFILL_CHUNK", "16384"))


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def filter_sample_logits(logits, temperature: float, top_p: float,
                         top_k: int = 0, min_p: float = 0.0):
    """Temperature-scale + filter logits for sampling (the distribution half
    of :func:`sample_token`, shared with speculative rejection sampling).

    ``top_p >= 1`` / ``top_k <= 0`` / ``min_p <= 0`` each disable that
    filter.  Enabled filters are computed independently over the
    temperature-scaled distribution and intersected (keep = above EVERY
    enabled threshold) — not sequentially renormalized.  The top-1 token
    satisfies every threshold, so extreme settings degrade to greedy rather
    than to an empty support set.

    logits: (..., V) f32; returns filtered (..., V) f32 logits.
    """
    logits = logits / jnp.maximum(temperature, 1e-6)
    thresh = None
    if top_p < 1.0 or top_k > 0:
        sorted_desc = -jnp.sort(-logits, axis=-1)
        if top_p < 1.0:
            probs = jax.nn.softmax(sorted_desc, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # keep tokens whose *preceding* mass is < top_p (top-1 always kept)
            keep = jnp.sum(cum - probs < top_p, axis=-1, keepdims=True)
            # clamp: top_p <= 0 gives keep=0, and index -1 would wrap to the
            # SMALLEST logit (disabling the filter); match sample_token_rows
            thresh = jnp.take_along_axis(
                sorted_desc, jnp.maximum(keep - 1, 0), axis=-1
            )
        if top_k > 0:
            k = min(int(top_k), logits.shape[-1])
            tk = sorted_desc[..., k - 1 : k]
            thresh = tk if thresh is None else jnp.maximum(thresh, tk)
    if min_p > 0.0:
        # p(tok) >= min_p * p(max)  <=>  logit >= max_logit + log(min_p)
        tm = logits.max(axis=-1, keepdims=True) + jnp.log(min_p)
        thresh = tm if thresh is None else jnp.maximum(thresh, tm)
    if thresh is not None:
        logits = jnp.where(logits >= thresh, logits, -jnp.inf)
    return logits


def sample_token(logits, key, temperature: float, top_p: float,
                 top_k: int = 0, min_p: float = 0.0):
    """Temperature + nucleus (top-p) / top-k / min-p sampling, on-device.

    The reference decodes greedily only (argmax, phi_3_vision_mlx.py:386);
    this is the serving-grade extension.  See :func:`filter_sample_logits`
    for the filter semantics.  logits: (B, V) f32; returns (B,) int32.
    """
    return jax.random.categorical(
        key, filter_sample_logits(logits, temperature, top_p, top_k, min_p),
        axis=-1,
    ).astype(jnp.int32)


def filter_sample_logits_rows(logits, temps, top_ps, top_ks=None, min_ps=None):
    """Per-row variant of :func:`filter_sample_logits` with ``(B,)`` device
    knob vectors; logits may be (B, V) or (B, L, V) (knobs broadcast over
    middle axes).  Returns filtered, temperature-scaled logits."""
    exp = lambda v: v.reshape(v.shape[0], *([1] * (logits.ndim - 2)))
    scaled = logits / jnp.maximum(exp(temps), 1e-6)[..., None]
    sorted_desc = -jnp.sort(-scaled, axis=-1)
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = jnp.sum(cum - probs < exp(top_ps)[..., None], axis=-1, keepdims=True)
    thresh = jnp.take_along_axis(sorted_desc, jnp.maximum(keep - 1, 0), axis=-1)
    if top_ks is not None:
        kidx = jnp.broadcast_to(
            jnp.clip(exp(top_ks), 1, scaled.shape[-1])[..., None] - 1,
            keep.shape,
        )
        tk = jnp.take_along_axis(sorted_desc, kidx, axis=-1)
        thresh = jnp.maximum(
            thresh, jnp.where((exp(top_ks) > 0)[..., None], tk, -jnp.inf)
        )
    if min_ps is not None:
        tm = scaled.max(axis=-1, keepdims=True) + jnp.log(
            jnp.maximum(exp(min_ps), 1e-38)
        )[..., None]
        thresh = jnp.maximum(
            thresh, jnp.where((exp(min_ps) > 0)[..., None], tm, -jnp.inf)
        )
    return jnp.where(scaled >= thresh, scaled, -jnp.inf)


def sample_token_rows(logits, key, temps, top_ps, top_ks=None, min_ps=None):
    """Per-row temperature + top-p / top-k / min-p sampling (slot engines).

    Unlike :func:`sample_token` (static scalar knobs), the knobs here are
    device ``(B,)`` vectors so one compiled step serves any mix of requests;
    rows with ``temps <= 0`` decode greedily (exact argmax, not a
    low-temperature approximation).  ``top_ks`` (int32, 0 = off) and
    ``min_ps`` (f32, 0 = off) may be None (compiles the two filters away)
    and compose with top-p by threshold intersection, matching
    :func:`sample_token`'s semantics.
    """
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    filtered = filter_sample_logits_rows(logits, temps, top_ps, top_ks, min_ps)
    sampled = jax.random.categorical(key, filtered, axis=-1).astype(jnp.int32)
    return jnp.where(temps > 0, sampled, greedy)


class LM:
    """A loaded model: config + params + a cache of compiled step functions.

    This is the object returned by ``load()`` (the reference returns an MLX
    ``nn.Module``; ours is an immutable bundle — all mutation lives in
    DecodeState values).
    """

    def __init__(
        self,
        cfg: ModelConfig,
        params: dict,
        model_path: Optional[str] = None,
        sp_mesh=None,
        sp_axis: str = "data",
    ):
        self.cfg = cfg
        self.params = params
        self.model_path = model_path
        self.eos_id = ID_EOS if cfg.vocab_size > ID_EOS else cfg.vocab_size - 1
        # Optional sequence-parallel prefill: when set, long text prompts
        # prefill via ring attention sharded over `sp_axis` of `sp_mesh`.
        self.sp_mesh = sp_mesh
        self.sp_axis = sp_axis
        self._fns = {}

    # -- compiled-function factory ------------------------------------------

    def _fn(self, key, builder, donate=()):
        if key not in self._fns:
            self._fns[key] = jax.jit(builder(), donate_argnums=donate)
        return self._fns[key]

    def prefill_fn(self, b: int, l: int, window: int, embeds: bool = False):
        cfg = self.cfg

        def build():
            def f(params, ids_or_embeds, pids, valid):
                res = phi3.prefill(
                    params,
                    cfg,
                    None if embeds else ids_or_embeds,
                    max_tokens=window - l,
                    pids=pids,
                    prompt_valid=valid,
                    inputs_embeds=ids_or_embeds if embeds else None,
                    last_logit_only=True,
                )
                return res.logits[:, -1, :].astype(jnp.float32), res.state

            return f

        return self._fn(("prefill", b, l, window, embeds), build)

    def prefill_vision_fn(self, b: int, l: int, window: int, img_lens: tuple):
        """Fused embed + image-feature scatter + prefill — one device call
        (the eager scatter/gather path costs ~100 ms/op through remote
        dispatch).  ``img_lens``: static per-image token counts; each image's
        features are scattered at its own (row, col)."""
        cfg = self.cfg

        def build():
            def f(params, ids, img_feats, rows, cols, pids, valid):
                from ..ops.linear import embedding

                emb = embedding(
                    params["model"]["embed_tokens"], jnp.maximum(ids, 0)
                ).astype(jnp.dtype(cfg.dtype))
                off = 0
                for i, n in enumerate(img_lens):
                    emb = lax.dynamic_update_slice(
                        emb,
                        img_feats[:, off : off + n].astype(emb.dtype),
                        (rows[i], cols[i], 0),
                    )
                    off += n
                res = phi3.prefill(
                    params, cfg, None, max_tokens=window - l, pids=pids,
                    prompt_valid=valid, inputs_embeds=emb,
                    last_logit_only=True,
                )
                return res.logits[:, -1, :].astype(jnp.float32), res.state

            return f

        return self._fn(("prefill_v", b, l, window, img_lens), build)

    def prefill_vision_raw_fn(self, b: int, l: int, window: int, img_grids: tuple):
        """THE fused VQA prefill: uint8 hd images -> logits in ONE device call.

        Normalize + global-view bicubic + crop tiling + CLIP tower + pooling
        + projection + embed + scatter + prefill, all in a single XLA program
        (the north-star "fused XLA image pipeline", SURVEY.md §2.3).
        ``img_grids``: static per-image (grid_h, grid_w, n_tokens).
        """
        cfg = self.cfg

        def build():
            def f(params, ids, imgs, rows, cols, pids, valid):
                from ..models.vision import device_image_features
                from ..ops.linear import embedding

                emb = embedding(
                    params["model"]["embed_tokens"], jnp.maximum(ids, 0)
                ).astype(jnp.dtype(cfg.dtype))
                vparams = params["model"]["vision_embed_tokens"]
                for i, (gh, gw, n_tok) in enumerate(img_grids):
                    feats = device_image_features(
                        vparams, cfg.vision, cfg.image_dim_out, imgs[i], gh, gw
                    )
                    emb = lax.dynamic_update_slice(
                        emb, feats.astype(emb.dtype), (rows[i], cols[i], 0)
                    )
                res = phi3.prefill(
                    params, cfg, None, max_tokens=window - l, pids=pids,
                    prompt_valid=valid, inputs_embeds=emb,
                    last_logit_only=True,
                )
                return res.logits[:, -1, :].astype(jnp.float32), res.state

            return f

        return self._fn(("prefill_vraw", b, l, window, img_grids), build)

    def prefill_vision_rawimg_fn(self, b: int, l: int, window: int,
                                 img_specs: tuple):
        """Like :meth:`prefill_vision_raw_fn` but from ORIGINAL uint8 images:
        the hd_transform bilinear resize also runs on device (static PIL-
        equivalent matrices), so the per-call H2D payload is the small
        original image.  ``img_specs``: per-image static
        ``(grid_h, grid_w, n_tokens, plan_items)``.
        """
        cfg = self.cfg

        def build():
            def f(params, ids, imgs, rows, cols, pids, valid):
                from ..models.vision import device_image_features_raw
                from ..ops.linear import embedding

                emb = embedding(
                    params["model"]["embed_tokens"], jnp.maximum(ids, 0)
                ).astype(jnp.dtype(cfg.dtype))
                vparams = params["model"]["vision_embed_tokens"]
                for i, (gh, gw, n_tok, plan_items) in enumerate(img_specs):
                    feats = device_image_features_raw(
                        vparams, cfg.vision, cfg.image_dim_out, imgs[i],
                        dict(plan_items), gh, gw,
                    )
                    emb = lax.dynamic_update_slice(
                        emb, feats.astype(emb.dtype), (rows[i], cols[i], 0)
                    )
                res = phi3.prefill(
                    params, cfg, None, max_tokens=window - l, pids=pids,
                    prompt_valid=valid, inputs_embeds=emb,
                    last_logit_only=True,
                )
                return res.logits[:, -1, :].astype(jnp.float32), res.state

            return f

        return self._fn(("prefill_vrawimg", b, l, window, img_specs), build)

    def extend_fn(self, b: int, l: int, window: int):
        """Feed an additional committed prompt chunk (chunked prefill)."""
        cfg = self.cfg

        def build():
            def f(params, ids, state):
                res = phi3.decode_forward(
                    params, cfg, state, input_ids=ids, last_logit_only=True
                )
                return res.logits[:, -1, :].astype(jnp.float32), res.state

            return f

        return self._fn(("extend", b, l, window), build, donate=(2,))

    def chunk_fn(self, b: int, window: int, n_steps: int, sampler=None):
        """Compiled CHUNK-step decode scan.

        ``sampler``: None for greedy (reference parity) or a static
        ``(temperature, top_p, top_k, min_p)`` tuple — token selection then
        runs :func:`sample_token` on-device with a per-step folded rng key.
        """
        cfg, eos_id = self.cfg, self.eos_id

        def build():
            def f(params, token, state, key):
                def body(carry, step_i):
                    tok, st = carry
                    res = phi3.decode_forward(params, cfg, st, input_ids=tok)
                    logits = res.logits[:, -1, :].astype(jnp.float32)
                    lp = jax.nn.log_softmax(logits, axis=-1)
                    if sampler is None:
                        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
                    else:
                        nxt = sample_token(
                            logits, jax.random.fold_in(key, step_i), *sampler
                        )[:, None]
                    stats = (nxt[:, 0], lp.max(axis=-1), lp[:, eos_id])
                    return (nxt, res.state), stats

                (tok_f, st_f), (toks, maxlp, eoslp) = lax.scan(
                    body, (token, state), jnp.arange(n_steps)
                )
                return tok_f, st_f, toks, maxlp, eoslp

            return f

        return self._fn(("chunk", b, window, n_steps, sampler), build, donate=(2,))

    def score_fn(self, b: int, l: int, window: int, advance: Optional[int]):
        """Score an L-token chunk, committing ``advance`` positions
        (reference advance_offset calls, phi_3_vision_mlx.py:545,570)."""
        cfg = self.cfg

        def build():
            def f(params, ids, state):
                res = phi3.decode_forward(
                    params, cfg, state, input_ids=ids, advance=advance
                )
                lp = jax.nn.log_softmax(res.logits.astype(jnp.float32), axis=-1)
                return lp, res.state

            return f

        return self._fn(("score", b, l, window, advance), build, donate=(2,))

    def beam_fn(self, b: int, l: int, window: int, n_beam: int):
        cfg = self.cfg

        def build():
            def f(params, beam_ids, state):
                res = phi3.decode_forward(
                    params, cfg, state, input_ids=beam_ids, n_beam=n_beam
                )
                return jax.nn.log_softmax(res.logits.astype(jnp.float32), axis=-1)

            return f

        return self._fn(("beam", b, l, window, n_beam), build)

    def nocache_fn(self, b: int, l: int):
        cfg = self.cfg

        def build():
            def f(params, ids, pids, valid):
                logits = phi3.forward_nocache(
                    params, cfg, ids, pids=pids, prompt_valid=valid
                )
                return jax.nn.log_softmax(
                    logits[:, -1, :].astype(jnp.float32), axis=-1
                )

            return f

        return self._fn(("nocache", b, l), build)


# ---------------------------------------------------------------------------
# Input prep: bucket + left-pad (reference left-pad semantics, phi.py:233-245)
# ---------------------------------------------------------------------------


def pad_prompt_inputs(dict_input: dict, target_l: int):
    """Left-pad (ids, pids, mask) numpy inputs to ``target_l`` columns."""
    ids = np.asarray(dict_input["input_ids"])
    b, l = ids.shape
    pad = target_l - l
    pids = np.asarray(
        dict_input.get("pids")
        if dict_input.get("pids") is not None
        else np.tile(np.arange(l, dtype=np.int32), (b, 1))
    )
    mask = np.asarray(
        dict_input.get("mask")
        if dict_input.get("mask") is not None
        else np.ones((b, l), np.int32)
    )
    if pad > 0:
        ids = np.concatenate([np.zeros((b, pad), ids.dtype), ids], axis=1)
        pids = np.concatenate([np.ones((b, pad), pids.dtype), pids], axis=1)
        mask = np.concatenate([np.zeros((b, pad), mask.dtype), mask], axis=1)
    return ids, pids, mask.astype(bool)


def run_prefill(lm: LM, dict_input: dict, max_tokens: int, inputs_embeds=None):
    """Bucketed (and, for long prompts, chunked) prefill.

    Returns (last_logits (B,V) fp32 np, state, l_pad, window).
    """
    ids = np.asarray(dict_input["input_ids"])
    b, l = ids.shape
    l_pad = max(round_up(l, PROMPT_BUCKET), PROMPT_BUCKET)
    window = round_up(l_pad + max(int(max_tokens), 1), WINDOW_BUCKET)
    ids_p, pids_p, valid_p = pad_prompt_inputs(dict_input, l_pad)

    if inputs_embeds is not None:
        pad = l_pad - inputs_embeds.shape[1]
        if pad > 0:
            from ..ops.linear import embedding

            pad_emb = embedding(
                lm.params["model"]["embed_tokens"], jnp.zeros((b, pad), jnp.int32)
            )
            inputs_embeds = jnp.concatenate(
                [pad_emb.astype(inputs_embeds.dtype), inputs_embeds], axis=1
            )
        fn = lm.prefill_fn(b, l_pad, window, embeds=True)
        logits, state = fn(lm.params, inputs_embeds, jnp.asarray(pids_p), jnp.asarray(valid_p))
        return logits, state, l_pad, window

    if dict_input.get("raw_images") is not None:
        # Fully-fused device pipeline from ORIGINAL pixels: bilinear resize +
        # pad + normalize + bicubic global view + tiling + CLIP + scatter +
        # prefill, one dispatch; H2D ships the small original image.
        positions = np.asarray(dict_input["positions"])
        sizes = np.asarray(dict_input["image_sizes"])
        specs, rows, cols, idx = [], [], [], 0
        for i, plan in enumerate(dict_input["resize_plans"]):
            gh, gw = int(sizes[i][0]) // 336, int(sizes[i][1]) // 336
            n_tok = int((gh * gw + 1) * 144 + 1 + (gh + 1) * 12)
            specs.append((gh, gw, n_tok, tuple(sorted(plan.items()))))
            rows.append(int(positions[idx][0]))
            cols.append(int(positions[idx][1]) + (l_pad - l))
            idx += n_tok
        fn = lm.prefill_vision_rawimg_fn(b, l_pad, window, tuple(specs))
        logits, state = fn(
            lm.params, jnp.asarray(ids_p),
            tuple(jnp.asarray(img) for img in dict_input["raw_images"]),
            jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32),
            jnp.asarray(pids_p), jnp.asarray(valid_p),
        )
        return logits, state, l_pad, window

    if dict_input.get("hd_images") is not None:
        # Fused device-side pipeline: ONE dispatch does normalize + bicubic
        # global view + crop tiling + CLIP + scatter + prefill.
        positions = np.asarray(dict_input["positions"])
        sizes = np.asarray(dict_input["image_sizes"])
        grids, rows, cols, idx = [], [], [], 0
        for i, img in enumerate(dict_input["hd_images"]):
            gh, gw = int(sizes[i][0]) // 336, int(sizes[i][1]) // 336
            n_tok = int((gh * gw + 1) * 144 + 1 + (gh + 1) * 12)
            grids.append((gh, gw, n_tok))
            rows.append(int(positions[idx][0]))
            cols.append(int(positions[idx][1]) + (l_pad - l))
            idx += n_tok
        fn = lm.prefill_vision_raw_fn(b, l_pad, window, tuple(grids))
        logits, state = fn(
            lm.params, jnp.asarray(ids_p),
            tuple(jnp.asarray(img) for img in dict_input["hd_images"]),
            jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32),
            jnp.asarray(pids_p), jnp.asarray(valid_p),
        )
        return logits, state, l_pad, window

    if dict_input.get("pixel_values") is not None:
        # Vision prompt: image features from the jitted per-image pipeline,
        # then one fused embed+scatter+prefill call.
        from ..models.vision import compute_image_embeds

        feats = compute_image_embeds(
            lm.params, lm.cfg, dict_input["pixel_values"], dict_input["image_sizes"]
        )
        img_feats = jnp.concatenate(feats, axis=1)  # (1, total_img_tokens, E)
        img_lens = tuple(int(f.shape[1]) for f in feats)
        positions = np.asarray(dict_input["positions"])
        pad = l_pad - l
        # first placeholder position of each image run (reference scatter,
        # phi.py:412-415)
        rows, cols, idx = [], [], 0
        for n in img_lens:
            rows.append(int(positions[idx][0]))
            cols.append(int(positions[idx][1]) + pad)
            idx += n
        fn = lm.prefill_vision_fn(b, l_pad, window, img_lens)
        logits, state = fn(
            lm.params, jnp.asarray(ids_p), img_feats,
            jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32),
            jnp.asarray(pids_p), jnp.asarray(valid_p),
        )
        return logits, state, l_pad, window

    if lm.sp_mesh is not None and l_pad % lm.sp_mesh.shape[lm.sp_axis] == 0:
        # Sequence-parallel prefill over the mesh ring (phi3.prefill_ring).
        def build():
            mesh, axis = lm.sp_mesh, lm.sp_axis

            def f(params, ids, pids, valid):
                res = phi3.prefill_ring(
                    params, lm.cfg, ids, mesh, max_tokens=window - l_pad,
                    seq_axis=axis, pids=pids, prompt_valid=valid,
                )
                return res.logits[:, -1, :].astype(jnp.float32), res.state

            return f

        fn = lm._fn(("prefill_ring", b, l_pad, window), build)
        logits, state = fn(
            lm.params, jnp.asarray(ids_p), jnp.asarray(pids_p), jnp.asarray(valid_p)
        )
        return logits, state, l_pad, window

    if l_pad <= PREFILL_CHUNK:
        fn = lm.prefill_fn(b, l_pad, window)
        logits, state = fn(
            lm.params, jnp.asarray(ids_p), jnp.asarray(pids_p), jnp.asarray(valid_p)
        )
        return logits, state, l_pad, window

    # Chunked prefill: allocate the full window up front, then feed the
    # prompt through extend_fn chunk by chunk.
    from ..engine.state import init_state

    state = init_state(
        lm.cfg, b, l_pad, window,
        pids=jnp.asarray(pids_p),
        prompt_valid=jnp.asarray(valid_p),
        compute_dtype=jnp.dtype(lm.cfg.dtype),
    )
    logits = None
    pos = 0
    while pos < l_pad:
        n = min(PREFILL_CHUNK, l_pad - pos)
        efn = lm.extend_fn(b, n, window)
        logits, state = efn(lm.params, jnp.asarray(ids_p[:, pos : pos + n]), state)
        pos += n
    return logits, state, l_pad, window


# ---------------------------------------------------------------------------
# The generate loop (reference ``_generate``, phi_3_vision_mlx.py:376-409)
# ---------------------------------------------------------------------------


def generate_text(
    lm: LM,
    processor,
    prompt,
    images=None,
    max_tokens: int = 512,
    verbose: bool = True,
    return_tps: bool = False,
    early_stop=False,
    stream: bool = True,
    mute: bool = False,
    sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
    top_k: int = 0,
    min_p: float = 0.0,
    seed: int = 0,
    speculative: Optional[bool] = None,
    stop=None,
):
    if images is not None and isinstance(prompt, list):
        raise ValueError("Images cannot be provided when prompt is a list")
    sampler = (
        (float(temperature), float(top_p), int(top_k), float(min_p))
        if sample
        else None
    )
    if speculative is None:
        speculative = os.environ.get("PHI3V_TPU_SPEC", "0") == "1"
    dict_input = processor(prompt, images)
    b = int(np.asarray(dict_input["input_ids"]).shape[0])

    inputs_embeds = None  # vision prompts are fused inside run_prefill

    logit_stopper = LogitStopper(max_tokens, early_stop)
    token_stopper = TokenStopper(b, lm.eos_id)
    stop_seqs = StopSequences(processor.tokenizer, stop, b)
    streamer = Streamer(processor.tokenizer, stream, mute, stops=stop_seqs.stops)

    tic = Tic()
    last_logits, state, l_pad, window = run_prefill(
        lm, dict_input, max_tokens, inputs_embeds=inputs_embeds
    )
    base_key = jax.random.PRNGKey(seed)
    if sampler is None:
        token = np.argmax(jax.device_get(last_logits), axis=-1).astype(np.int32)[:, None]
    else:
        first_fn = lm._fn(
            ("sample1", b, sampler),
            lambda: (lambda lg, k: sample_token(lg, k, *sampler)),
        )
        token = np.asarray(
            jax.device_get(first_fn(jnp.asarray(last_logits), base_key))
        ).astype(np.int32)[:, None]
    streamer(token)
    prompt_time = tic()

    n_emitted = 1
    tok_dev = jnp.asarray(token)
    stop = bool(stop_seqs) and stop_seqs.update(token)
    step_timer = None
    step_log = os.environ.get("PHI3V_TPU_STEP_LOG")
    if step_log:
        from ..utils.profiler import StepTimer

        step_timer = StepTimer()
        step_timer.tick()
    chunk, chunk_max = _chunk_schedule()
    chunk_i = 0

    # Prompt-lookup speculative decoding (engine/speculative.py),
    # single-stream only.  Emits 1..K+1 tokens per weight pass; greedy is
    # bit-identical to the vanilla path, sampling composes via
    # rejection-sampled verification (distribution-exact).
    use_spec = bool(speculative) and b == 1
    spec_buf = None
    if use_spec:
        from .speculative import init_token_buffer, spec_chunk_fn

        spec_k = int(os.environ.get("PHI3V_TPU_SPEC_K", "7"))
        spec_iters = int(os.environ.get("PHI3V_TPU_SPEC_ITERS", "64"))
        ids_sp, _, _ = pad_prompt_inputs(dict_input, l_pad)
        spec_buf = init_token_buffer(ids_sp, window)
        spec_off = l_pad  # host mirror of the committed device offset
        lm._spec_stats = {"iters": 0, "emitted": 0}

    while n_emitted < max_tokens and not stop:
        if use_spec:
            if window - spec_off >= spec_k + 1:
                # The scan self-limits on device (budget + window guard), so
                # one compiled size serves the whole generation; a dispatch
                # with room for >= 1 iteration always makes progress.
                fn = spec_chunk_fn(lm, window, spec_iters, spec_k,
                                   sampler=sampler)
                budget = jnp.asarray(max_tokens - n_emitted, jnp.int32)
                chunk_i += 1
                spec_key = jax.random.fold_in(base_key, 1_000_000 + chunk_i)
                tok_dev, state, spec_buf, toks_s, maxlp_s, eoslp_s, n_emits = fn(
                    lm.params, tok_dev, state, spec_buf, budget, spec_key
                )
                toks_s, maxlp_s, eoslp_s, n_emits = jax.device_get(
                    (toks_s, maxlp_s, eoslp_s, n_emits)
                )  # one host transfer; toks_s: (n_iters, 1, K+1)
                if step_timer is not None:
                    step_timer.tick()
                for it in range(spec_iters):
                    m = int(n_emits[it])
                    if m == 0:  # budget/window exhausted on device
                        continue
                    spec_off += m
                    lm._spec_stats["iters"] += 1
                    lm._spec_stats["emitted"] += m
                    for p in range(m):
                        streamer(toks_s[it][:, p][:, None])
                        n_emitted += 1
                        if logit_stopper.update(
                            float(maxlp_s[it, 0, p]), float(eoslp_s[it, 0, p]), b
                        ):
                            stop = True
                            break
                        if token_stopper.update(toks_s[it, :, p]):
                            stop = True
                            break
                        if stop_seqs and stop_seqs.update(toks_s[it, :, p]):
                            stop = True
                            break
                        if n_emitted >= max_tokens:
                            break
                    if stop or n_emitted >= max_tokens:
                        break
                continue
            # Window tail too tight for speculation: the rest of this
            # generation decodes through the vanilla chunk path (spec_off
            # stops mirroring the device offset once vanilla steps run).
            use_spec = False
        n_steps = min(chunk, max_tokens - n_emitted)
        chunk = min(chunk * 4, chunk_max)
        fn = lm.chunk_fn(b, window, n_steps, sampler=sampler)
        chunk_i += 1
        tok_dev, state, toks, maxlp, eoslp = fn(
            lm.params, tok_dev, state, jax.random.fold_in(base_key, chunk_i)
        )
        toks, maxlp, eoslp = jax.device_get((toks, maxlp, eoslp))  # (n, B)
        if step_timer is not None:
            step_timer.tick()  # one sample per decode-chunk dispatch
        for i in range(n_steps):
            # Host-side replay of the reference loop's checks, in its order
            # (phi_3_vision_mlx.py:390-398): stream the token, then the logit
            # stopper consumes the logits that *produced* it, then EOS check.
            streamer(toks[i][:, None])
            n_emitted += 1
            if logit_stopper.update(float(maxlp[i, 0]), float(eoslp[i, 0]), b):
                stop = True
                break
            if token_stopper.update(toks[i]):
                stop = True
                break
            if stop_seqs and stop_seqs.update(toks[i]):
                stop = True
                break
            if n_emitted >= max_tokens:
                break

    result, gen_len = streamer.end()
    result = stop_seqs.trim(result)
    gen_time = tic()
    if step_timer is not None:
        step_timer.dump(step_log)
    prompt_len = int(np.asarray(dict_input["input_ids"]).size)
    prompt_tps = prompt_len / prompt_time
    gen_tps = (gen_len - 1) / max(gen_time, 1e-9)
    if verbose:
        print(
            f"\nPrompt: {prompt_tps:.2f} tokens-per-sec "
            f"({prompt_len} tokens / {prompt_time:.1f} sec)"
        )
        print(
            f"Generate: {gen_tps:.2f} tokens-per-sec "
            f"({gen_len} tokens / {gen_time:.1f} sec)"
        )
    if return_tps:
        return prompt_tps, gen_tps
    return result
