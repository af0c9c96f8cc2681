"""On-device sampling (temperature / top-p / top-k / min-p): determinism,
filter math, greedy degradation, API + slot-engine plumbing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phi_3_vision_mlx_tpu.engine.engine import sample_token, sample_token_rows

VOCAB = 32064


@pytest.fixture(scope="module")
def lmproc(tmp_path_factory):
    from phi_3_vision_mlx_tpu.api import _load
    from phi_3_vision_mlx_tpu.core import weights as W

    path = str(tmp_path_factory.mktemp("models") / "tiny_sample")
    W.create_random_checkpoint(path, "tiny", vocab_size=VOCAB)
    return _load(path)


def test_top_p_restricts_support():
    """With top_p covering the two biggest tokens (threshold away from the
    cumulative-mass boundary — 0.8 exactly is epsilon-sensitive), samples
    only ever come from them."""
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.1, 0.06, 0.04]], jnp.float32))
    counts = np.zeros(5)
    for i in range(400):
        t = int(sample_token(logits, jax.random.PRNGKey(i), 1.0, 0.75)[0])
        counts[t] += 1
    assert counts[2:].sum() == 0, counts
    assert counts[0] > counts[1] > 0


def test_tiny_temperature_is_greedy():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    toks = sample_token(logits, jax.random.PRNGKey(0), 1e-4, 1.0)
    np.testing.assert_array_equal(np.asarray(toks), np.argmax(np.asarray(logits), -1))


def test_top_p_always_keeps_top1():
    logits = jnp.asarray([[2.0, 1.0, 0.0]], jnp.float32)
    for i in range(20):
        t = int(sample_token(logits, jax.random.PRNGKey(i), 1.0, 1e-9)[0])
        assert t == 0


def test_top_k_restricts_support():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.1, 0.06, 0.04]], jnp.float32))
    counts = np.zeros(5)
    for i in range(300):
        t = int(sample_token(logits, jax.random.PRNGKey(i), 1.0, 1.0, top_k=2)[0])
        counts[t] += 1
    assert counts[2:].sum() == 0, counts
    assert counts[0] > counts[1] > 0


def test_top_k1_is_greedy_at_any_temperature():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 128)), jnp.float32)
    for i in range(10):
        toks = sample_token(logits, jax.random.PRNGKey(i), 5.0, 1.0, top_k=1)
        np.testing.assert_array_equal(
            np.asarray(toks), np.argmax(np.asarray(logits), -1)
        )


def test_min_p_restricts_support():
    """min_p=0.5 keeps tokens with p >= 0.5 * p_max = 0.25 -> {0, 1} only."""
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.1, 0.06, 0.04]], jnp.float32))
    counts = np.zeros(5)
    for i in range(300):
        t = int(sample_token(logits, jax.random.PRNGKey(i), 1.0, 1.0, min_p=0.5)[0])
        counts[t] += 1
    assert counts[2:].sum() == 0, counts
    assert counts[0] > counts[1] > 0


def test_rows_per_row_filters():
    """One (B,) call mixing greedy, top-k=1, top-k=2, and min-p rows."""
    base = np.log(np.asarray([0.5, 0.3, 0.1, 0.06, 0.04], np.float32))
    logits = jnp.asarray(np.tile(base, (4, 1)))
    temps = jnp.asarray([0.0, 2.0, 1.0, 1.0], jnp.float32)
    tops = jnp.ones((4,), jnp.float32)
    topks = jnp.asarray([0, 1, 2, 0], jnp.int32)
    minps = jnp.asarray([0.0, 0.0, 0.0, 0.5], jnp.float32)
    seen = [set() for _ in range(4)]
    for i in range(200):
        toks = np.asarray(
            sample_token_rows(
                logits, jax.random.PRNGKey(i), temps, tops,
                top_ks=topks, min_ps=minps,
            )
        )
        for r in range(4):
            seen[r].add(int(toks[r]))
    assert seen[0] == {0}  # temp 0 -> exact greedy
    assert seen[1] == {0}  # top-k 1 -> argmax even at temp 2
    assert seen[2] <= {0, 1} and len(seen[2]) == 2  # top-k 2
    assert seen[3] <= {0, 1} and len(seen[3]) == 2  # min-p 0.5


def test_rows_none_filters_match_old_signature():
    """top_ks/min_ps=None must reproduce the two-knob behavior exactly."""
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    temps = jnp.asarray([0.0, 0.7, 1.3, 1.0], jnp.float32)
    tops = jnp.asarray([1.0, 0.9, 0.5, 1.0], jnp.float32)
    for i in range(5):
        a = np.asarray(
            sample_token_rows(logits, jax.random.PRNGKey(i), temps, tops)
        )
        b = np.asarray(
            sample_token_rows(
                logits, jax.random.PRNGKey(i), temps, tops,
                top_ks=jnp.zeros((4,), jnp.int32),
                min_ps=jnp.zeros((4,), jnp.float32),
            )
        )
        np.testing.assert_array_equal(a, b)


def test_generate_sampling_api(lmproc):
    """sample=True is seed-deterministic and (generically) differs from
    greedy; sample=False stays the reference-parity greedy path."""
    from phi_3_vision_mlx_tpu.api import generate

    kw = dict(preload=lmproc, max_tokens=8, verbose=False, stream=False,
              mute=True)
    a1 = generate("Hello", sample=True, temperature=1.2, top_p=0.9, seed=7, **kw)
    a2 = generate("Hello", sample=True, temperature=1.2, top_p=0.9, seed=7, **kw)
    assert a1 == a2  # same seed -> same stream
    g1 = generate("Hello", **kw)
    g2 = generate("Hello", **kw)
    assert g1 == g2


def test_generate_top_k1_matches_greedy(lmproc):
    """top_k=1 forces argmax regardless of temperature -> the sampled
    stream equals the greedy stream token for token."""
    from phi_3_vision_mlx_tpu.api import generate

    kw = dict(preload=lmproc, max_tokens=8, verbose=False, stream=False,
              mute=True)
    greedy = generate("Hello there", **kw)
    forced = generate(
        "Hello there", sample=True, temperature=3.0, top_k=1, seed=11, **kw
    )
    assert forced == greedy


def test_batch_engine_top_k1_matches_greedy(lmproc):
    """Per-slot top-k/min-p plumb through the slot engine: a top_k=1 request
    at high temperature decodes the exact greedy stream, alongside a plain
    greedy request in the same chunk."""
    from phi_3_vision_mlx_tpu.engine.batching import BatchEngine

    lm, proc = lmproc
    eng = BatchEngine(lm, proc, slots=2, window=128)
    pa, pb = "Tell me about the sea.", "Write a poem in winter."
    ra = eng.submit(pa, max_tokens=10)  # greedy row
    rb = eng.submit(pb, max_tokens=10, temperature=2.5, top_k=1, min_p=0.05)
    while eng.pending():
        eng.step(2)
    eng2 = BatchEngine(lm, proc, slots=2, window=128)
    ga = eng2.submit(pa, max_tokens=10)
    gb = eng2.submit(pb, max_tokens=10)
    while eng2.pending():
        eng2.step(2)
    assert eng.tokens(ra) == eng2.tokens(ga)
    assert eng.tokens(rb) == eng2.tokens(gb)
