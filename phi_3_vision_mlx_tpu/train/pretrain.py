"""Full-parameter causal-LM pretraining + the synthetic induction corpus.

The reference trains only LoRA adapters (phi_3_vision_mlx.py:960-1046); this
module adds from-scratch training of (tiny) Phi-3 configs with the same
jit/donation discipline as the rest of the stack: one compiled train step,
``(params, opt_state)`` donated so XLA updates the buffers in place.

Primary consumer: the speculative-decoding **mid-envelope benchmark**.  The
published prompt-lookup numbers bracket an envelope — a ceiling (echo model,
all drafts accept) and a floor (acceptance ~0) — because random weights
cannot *echo* their context.  A tiny model trained here on the induction
corpus genuinely learns to copy repeated phrases (induction behavior), so
measuring tokens/pass on held-out docs gives a defensible mid-envelope
acceptance: the drafts are real n-gram continuations, the verifier is a real
trained model, and rejections happen exactly where the text stops being
copyable (phrase boundaries).  See bench_extra.py:spec_mid_envelope and
tests/test_pretrain_induction.py.
"""

from __future__ import annotations

import string
from typing import Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import ModelConfig, preset
from ..models import phi3
from ..models.tokenizer import ByteTokenizer, ID_BOS

# ---------------------------------------------------------------------------
# Loss + train loop
# ---------------------------------------------------------------------------


def make_clm_loss(cfg: ModelConfig):
    """Next-token cross-entropy over all (full) parameters.

    Mirrors the LoRA loss (trainer.make_loss_fn) minus the adapter
    merge/dropout plumbing: one ``forward_nocache`` pass, shifted targets,
    pad positions masked out.
    """

    def loss_fn(params, ids, valid):
        logits = phi3.forward_nocache(
            params, cfg, ids, prompt_valid=valid, allow_flash=False
        )
        logits = logits[:, :-1].astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, ids[:, 1:])
        m = (valid[:, 1:] & valid[:, :-1]).astype(jnp.float32)
        return (ce * m).sum() / jnp.maximum(m.sum(), 1.0)

    return loss_fn


def pretrain(
    cfg: ModelConfig,
    params: dict,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    lr: float = 1e-3,
    warmup: int = 20,
    steps: int | None = None,
    scan_steps: int = 1,
) -> Tuple[dict, List[float]]:
    """Run AdamW over ``batches`` of (ids (B, L) int32, valid (B, L) bool).

    One jitted dispatch per ``scan_steps`` optimizer steps (a ``lax.scan``
    over stacked batches), ``(params, opt_state)`` donated.  Host/tunnel
    round trips dominate per-step dispatch at tiny model sizes, so the TPU
    bench uses scan_steps≈16; the CPU tests keep 1.  All batches must share
    one (B, L) shape so a single compilation serves the run (the corpus
    helpers below guarantee this).  Returns (trained params, loss history).
    """
    bl = list(batches)
    n = steps if steps is not None else len(bl)
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(n, warmup + 1))
    opt = optax.adamw(sched, weight_decay=0.01)
    loss_fn = make_clm_loss(cfg)

    def _one(carry, batch):
        params, opt_state = carry
        ids, valid = batch
        loss, grads = jax.value_and_grad(loss_fn)(params, ids, valid)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    def _chunk(params, opt_state, ids, valid):
        (params, opt_state), losses = jax.lax.scan(
            _one, (params, opt_state), (ids, valid)
        )
        return params, opt_state, losses

    train_chunk = jax.jit(_chunk, donate_argnums=(0, 1))
    opt_state = opt.init(params)
    losses: List[float] = []
    k = 0
    while k < n:
        m = min(scan_steps, n - k)  # tail chunk: one extra (smaller) compile
        ids = jnp.stack([jnp.asarray(bl[(k + j) % len(bl)][0]) for j in range(m)])
        valid = jnp.stack([jnp.asarray(bl[(k + j) % len(bl)][1]) for j in range(m)])
        params, opt_state, ls = train_chunk(params, opt_state, ids, valid)
        losses.extend(float(x) for x in np.asarray(ls))
        k += m
    return params, losses


# ---------------------------------------------------------------------------
# Induction corpus
# ---------------------------------------------------------------------------


def induction_docs(
    rng: np.random.Generator,
    n_docs: int,
    n_phrases: int = 4,
    phrase_len: int = 8,
    phrases_per_doc: int = 14,
    shared_pool: int = 0,
) -> List[str]:
    """Docs made of repeated random phrases — the induction task.

    Each doc draws ``n_phrases`` fresh random lowercase phrases (length
    ``phrase_len``) and concatenates ``phrases_per_doc`` uniform choices of
    them, space-separated.  Within a doc every phrase recurs ~3-4 times, so
    a next-byte model must learn to COPY from earlier context (induction):
    once a phrase's first byte is determined, its remaining bytes are exact
    repeats; which phrase starts next is irreducibly random.  That split is
    what makes prompt-lookup acceptance land mid-envelope: drafts accept
    through phrase bodies and reject at phrase boundaries.

    ``shared_pool`` > 0 additionally mixes in that many corpus-global
    phrases (memorizable across docs), making the task learnable faster.
    """
    letters = np.array(list(string.ascii_lowercase))
    globals_pool = [
        "".join(rng.choice(letters, phrase_len)) for _ in range(shared_pool)
    ]
    docs = []
    for _ in range(n_docs):
        local = ["".join(rng.choice(letters, phrase_len)) for _ in range(n_phrases)]
        pool = local + globals_pool
        docs.append(" ".join(pool[rng.integers(len(pool))] for _ in range(phrases_per_doc)))
    return docs


def encode_docs(docs: List[str], seq_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """ByteTokenizer-encode to fixed (N, seq_len) ids + valid mask."""
    tok = ByteTokenizer()
    ids = np.zeros((len(docs), seq_len), np.int32)
    valid = np.zeros((len(docs), seq_len), bool)
    for i, d in enumerate(docs):
        e = tok.encode(d)[:seq_len]
        ids[i, : len(e)] = e
        valid[i, : len(e)] = True
    return ids, valid


def induction_batches(
    seed: int, n_batches: int, bs: int, seq_len: int, **doc_kw
) -> List[Tuple[np.ndarray, np.ndarray]]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        ids, valid = encode_docs(induction_docs(rng, bs, **doc_kw), seq_len)
        out.append((ids, valid))
    return out


# ---------------------------------------------------------------------------
# End-to-end: train a tiny induction LM and save it as a checkpoint
# ---------------------------------------------------------------------------

# ByteTokenizer maps byte b -> id 1000+b, BOS=1; 1280 covers every id the
# raw (untemplated) corpus can produce while keeping the lm_head tiny.
INDUCTION_VOCAB = 1280


def train_induction_lm(
    path: str,
    steps: int = 240,
    bs: int = 8,
    seq_len: int = 128,
    lr: float = 1.5e-3,
    seed: int = 0,
    n_batches: int = 24,
    scan_steps: int = 1,
    **overrides,
):
    """Train the tiny induction LM from scratch and write a loadable
    checkpoint at ``path`` (config.json + safetensors, api._load format).

    Returns (cfg, loss history).  Deterministic in ``seed``.
    """
    from ..core import weights as W

    cfg = preset(
        "tiny",
        vocab_size=INDUCTION_VOCAB,
        max_position_embeddings=1024,
        original_max_position_embeddings=256,
        **overrides,
    )
    params = phi3.init_params(cfg, jax.random.PRNGKey(seed))
    batches = induction_batches(seed + 1, n_batches, bs, seq_len)
    params, losses = pretrain(
        cfg, params, batches, lr=lr, steps=steps, scan_steps=scan_steps
    )
    params = jax.device_get(params)
    W.save_checkpoint(path, cfg, params)
    return cfg, losses


def measure_tokens_per_pass(
    preload,
    prompt: str,
    max_tokens: int = 96,
    spec_k: int = 7,
) -> Tuple[float, str]:
    """Greedy prompt-lookup generation; returns (tokens/pass, text)."""
    import os

    from .. import api

    lm, _ = preload
    os.environ.setdefault("PHI3V_TPU_SPEC_K", str(spec_k))
    text = api.generate(
        prompt,
        preload=preload,
        max_tokens=max_tokens,
        verbose=False,
        stream=False,
        mute=True,
        speculative=True,
        apply_chat_template=False,
    )
    st = lm._spec_stats
    tpp = st["emitted"] / max(st["iters"], 1)
    return tpp, text
