"""Speculative decoding x sampling (rejection-sampled verification).

VERDICT r3 item 5: the two flagship serving features — speculation and
per-request temperature — must compose.  `verify_sampled` accepts a draft
token d with probability p(d) and resamples from the residual on rejection,
so each emitted token is distributed EXACTLY as vanilla sampling; the
statistical tests below check the empirical distribution, and the engine
tests check the wiring (single-stream + slot engines, mixed greedy/sampled).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from phi_3_vision_mlx_tpu.engine.engine import filter_sample_logits
from phi_3_vision_mlx_tpu.engine.speculative import (
    verify_mixed_rows,
    verify_sampled,
)

VOCAB = 32064


def _empirical(fn, n, vocab):
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    toks = np.asarray(jax.vmap(fn)(keys))
    return np.bincount(toks.reshape(-1), minlength=vocab) / toks.size


def test_verify_sampled_first_token_matches_vanilla_distribution():
    """The marginal of the first emitted token (accept-or-residual-resample)
    equals direct sampling from the filtered target."""
    v, k_draft = 12, 3
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, k_draft + 1, v)) * 2.0,
                         jnp.float32)
    draft = jnp.asarray([[3, 7, 1]], jnp.int32)
    sampler = (0.9, 0.95, 0, 0.0)

    def spec_first(key):
        out, _ = verify_sampled(logits, draft, key, *sampler)
        return out[0, 0]

    def vanilla(key):
        f = filter_sample_logits(logits[:, 0], *sampler)
        return jax.random.categorical(key, f, axis=-1)[0]

    n = 8000
    p_spec = _empirical(spec_first, n, v)
    p_van = _empirical(vanilla, n, v)
    # exact p for reference: filtered softmax
    p_true = np.asarray(jax.nn.softmax(filter_sample_logits(
        logits[:, 0], *sampler), axis=-1))[0]
    se = np.sqrt(p_true * (1 - p_true) / n) + 1e-9
    assert np.all(np.abs(p_spec - p_true) < 5 * se), (
        np.abs(p_spec - p_true) / se).max()
    assert np.all(np.abs(p_van - p_true) < 5 * se)


def test_verify_sampled_greedyish_accepts_all_matching_drafts():
    """With a near-deterministic target whose argmax chain equals the draft,
    acceptance is (almost) always full — the speedup case."""
    v, k = 8, 3
    logits = np.full((1, k + 1, v), -20.0, np.float32)
    chain = [2, 5, 1, 4]
    for t, c in enumerate(chain):
        logits[0, t, c] = 20.0
    out, n_emit = verify_sampled(
        jnp.asarray(logits), jnp.asarray([chain[:k]], jnp.int32),
        jax.random.PRNGKey(0), 1.0, 1.0,
    )
    assert int(n_emit[0]) == k + 1
    assert np.asarray(out)[0].tolist() == chain


def test_verify_mixed_rows_greedy_rows_match_argmax():
    v, k = 16, 2
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((2, k + 1, v)), jnp.float32)
    draft = jnp.asarray(rng.integers(0, v, (2, k)), jnp.int32)
    temps = jnp.asarray([0.0, 1.0], jnp.float32)
    ones = jnp.ones((2,), jnp.float32)
    zeros_i = jnp.zeros((2,), jnp.int32)
    zeros_f = jnp.zeros((2,), jnp.float32)
    out, acc = verify_mixed_rows(logits, draft, jax.random.PRNGKey(1),
                                 temps, ones, zeros_i, zeros_f)
    out_g = np.argmax(np.asarray(logits), axis=-1)
    match = (np.asarray(draft)[0] == out_g[0, :-1]).astype(int)
    acc_g = int(np.cumprod(match).sum())
    assert np.asarray(out)[0].tolist() == out_g[0].tolist()
    assert int(np.asarray(acc)[0]) == acc_g


@pytest.fixture(scope="module")
def lmproc(tmp_path_factory):
    from phi_3_vision_mlx_tpu.api import _load
    from phi_3_vision_mlx_tpu.core import weights as W

    path = str(tmp_path_factory.mktemp("models") / "tiny_specs")
    W.create_random_checkpoint(path, "tiny", vocab_size=VOCAB)
    return _load(path)


def test_generate_sampled_speculative_runs(lmproc):
    """generate(sample=True, speculative=True) produces max_tokens tokens
    and records verify-pass stats (it used the spec path, not the fallback)."""
    from phi_3_vision_mlx_tpu.api import generate

    lm, proc = lmproc
    out = generate("Tell me a story.", preload=lmproc, max_tokens=12,
                   verbose=False, stream=False, mute=True, sample=True,
                   temperature=0.8, top_p=0.95, seed=3, speculative=True)
    assert isinstance(out, list) and len(out[0]) > 0
    assert lm._spec_stats["iters"] > 0
    assert lm._spec_stats["emitted"] >= lm._spec_stats["iters"]


def test_slot_engine_spec_mixed_sampling(lmproc):
    """spec_k engine with one greedy + one sampled request: the greedy row
    stays token-exact vs the non-speculative engine; the sampled row
    completes and differs (it actually sampled)."""
    from phi_3_vision_mlx_tpu.engine.batching import BatchEngine

    lm, proc = lmproc
    pa, pb = "Tell me about the sea.", "Write a poem in winter."

    ref = BatchEngine(lm, proc, slots=2, window=256)
    ga = ref.submit(pa, max_tokens=12)
    gb = ref.submit(pb, max_tokens=12, temperature=0.9, top_p=0.9)
    while ref.pending():
        ref.step(2)

    eng = BatchEngine(lm, proc, slots=2, window=256, spec_k=4)
    sa = eng.submit(pa, max_tokens=12)
    sb = eng.submit(pb, max_tokens=12, temperature=0.9, top_p=0.9)
    while eng.pending():
        eng.step(2)
    assert eng.spec_stats["passes"] > 0  # sampled batch still used spec
    assert eng.tokens(sa) == ref.tokens(ga)  # greedy row bit-exact
    assert len(eng.tokens(sb)) > 0  # sampled row completed through spec


def test_paged_engine_spec_sampled_completes(lmproc):
    from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine

    lm, proc = lmproc
    eng = PagedBatchEngine(lm, proc, slots=2, window=256, page_size=64,
                           pool_pages=8, spec_k=4)
    ra = eng.submit("Tell me about the sea.", max_tokens=10)
    rb = eng.submit("Write a poem.", max_tokens=10, temperature=1.1,
                    top_p=0.9, top_k=50)
    while eng.pending():
        eng.step(2)
    assert eng.spec_stats["passes"] > 0
    assert len(eng.tokens(ra)) > 0 and len(eng.tokens(rb)) > 0
