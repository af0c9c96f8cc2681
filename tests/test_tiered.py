"""Tiered (host-offloaded) KV cache vs the in-HBM quantized-cache path.

The tiered engine (engine/tiered.py) must be numerically interchangeable
with the standard path at any window size — these tests pin that down at
CPU-testable scale: same padded inputs, same quantization, logits close and
greedy tokens identical.  The pinned_host placement itself is exercised for
real (the CPU backend supports memory kinds), so eviction via out_shardings
and the scan-over-host-xs streaming both run here, just small.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phi_3_vision_mlx_tpu.core.config import preset
from phi_3_vision_mlx_tpu.engine import engine as E
from phi_3_vision_mlx_tpu.engine.tiered import TieredEngine, _pad_to_chunks
from phi_3_vision_mlx_tpu.models import phi3

CFG = preset("tiny", use_quantized_cache=True)
PC, HOT = 64, 64


@pytest.fixture(scope="module")
def lm():
    params = phi3.init_params(CFG, jax.random.PRNGKey(0))
    return E.LM(CFG, params)


@pytest.fixture(scope="module")
def eng(lm):
    """Shared engine: per-request state lives in TieredState, so one engine
    (and its compiled-program cache) serves every test in this module."""
    return TieredEngine(lm, chunk=PC, hot=HOT, k_block=32)


def _standard_reference(lm, dict_input, n_steps: int):
    """In-HBM quantized-cache prefill + greedy decode over the SAME padded
    window the tiered engine uses."""
    ids_p, pids_p, valid_p, l_pad = _pad_to_chunks(dict_input, PC)
    res = phi3.prefill(
        lm.params, CFG, jnp.asarray(ids_p), max_tokens=HOT,
        pids=jnp.asarray(pids_p), prompt_valid=jnp.asarray(valid_p),
        last_logit_only=True,
    )
    logits = np.asarray(res.logits[:, -1], np.float32)
    state = res.state
    tok = int(np.argmax(logits[0]))
    toks, logs = [tok], [logits]
    for _ in range(n_steps):
        r = phi3.decode_forward(params=lm.params, cfg=CFG, state=state,
                                input_ids=jnp.asarray([[tok]], jnp.int32))
        state = r.state
        logits = np.asarray(r.logits[:, -1], np.float32)
        tok = int(np.argmax(logits[0]))
        toks.append(tok)
        logs.append(logits)
    return toks, logs


def test_tiered_matches_in_hbm_path(lm, eng):
    """3 cold chunks + hot decode: prefill logits close, greedy identical."""
    rng = np.random.default_rng(0)
    ids = rng.integers(2, CFG.vocab_size, (1, 150)).astype(np.int32)
    dict_input = {"input_ids": ids}
    n_steps = 4

    ref_toks, ref_logs = _standard_reference(lm, dict_input, n_steps)

    logits, state = eng.prefill(dict_input)
    assert len(state.cold_k) == 3 and state.C == 192
    assert state.cold_k[0].sharding.memory_kind == "pinned_host"
    np.testing.assert_allclose(logits, ref_logs[0], rtol=3e-3, atol=3e-3)
    tok = int(np.argmax(logits[0]))
    toks = [tok]
    for i in range(n_steps):
        logits, state = eng.decode_step(state, np.array([[tok]], np.int32))
        logits = np.asarray(jax.device_get(logits), np.float32)
        np.testing.assert_allclose(logits, ref_logs[i + 1], rtol=3e-3, atol=3e-3)
        tok = int(np.argmax(logits[0]))
        toks.append(tok)
    assert toks == ref_toks


def test_tiered_generate_short_prompt(lm, eng):
    """A prompt shorter than one chunk still works (single cold chunk with
    left-pad masking) and matches the standard path."""
    rng = np.random.default_rng(1)
    ids = rng.integers(2, CFG.vocab_size, (1, 20)).astype(np.int32)
    dict_input = {"input_ids": ids}
    ref_toks, _ = _standard_reference(lm, dict_input, 5)

    toks = eng.generate(dict_input, max_tokens=6)
    assert toks == ref_toks[:6]


def test_tiered_rejects_overlong_decode(lm):
    eng = TieredEngine(lm, chunk=PC, hot=8)
    with pytest.raises(ValueError):
        eng.generate({"input_ids": np.array([[3, 4, 5]])}, max_tokens=64)


def test_tiered_spec_decode_matches_per_step(lm, eng):
    """spec_generate (prompt-lookup drafts verified in one lq=K+1 pass per
    cold-tier stream) emits the same greedy stream as the in-HBM path —
    rollback-free acceptance over the hot window is exact.  A repetitive
    prompt exercises non-zero acceptance; a random one exercises the
    all-reject path."""
    rng = np.random.default_rng(3)
    pattern = rng.integers(2, CFG.vocab_size, 12).astype(np.int32)
    ids = np.tile(pattern, 12)[None, :130]  # repetitive -> drafts accept
    for prompt in (ids, rng.integers(2, CFG.vocab_size, (1, 90)).astype(np.int32)):
        dict_input = {"input_ids": prompt}
        ref_toks, _ = _standard_reference(lm, dict_input, 9)
        toks = eng.spec_generate(dict_input, max_tokens=10, k_draft=3,
                                 n_iters=3)
        assert toks == ref_toks[:10]


def test_tiered_no_prefetch_matches(lm):
    """prefetch=False (serial stream, unrolled cold storage) stays exact —
    the default engine prefetches (layer-rolled cold storage + carried
    device copies), and both layouts must emit the same greedy stream."""
    rng = np.random.default_rng(5)
    ids = rng.integers(2, CFG.vocab_size, (1, 150)).astype(np.int32)
    dict_input = {"input_ids": ids}
    ref_toks, _ = _standard_reference(lm, dict_input, 5)
    eng = TieredEngine(lm, chunk=PC, hot=HOT, k_block=32, prefetch=False)
    assert eng.generate(dict_input, max_tokens=6) == ref_toks[:6]


def test_tiered_consolidate_matches(lm, eng):
    """Merging cold chunks (fewer, larger PCIe transfers) leaves logits and
    greedy tokens identical: the stats loop sees the same columns in the
    same order."""
    rng = np.random.default_rng(4)
    ids = rng.integers(2, CFG.vocab_size, (1, 250)).astype(np.int32)  # 4 chunks
    dict_input = {"input_ids": ids}
    ref_toks, ref_logs = _standard_reference(lm, dict_input, 3)

    for group in (2, 4):  # 4 also covers repeated/deep merges (g4 = one
        logits, state = eng.prefill(dict_input)  # jfn over all 4 chunks)
        assert len(state.cold_k) == 4
        state = eng.consolidate(state, group)
        assert len(state.cold_k) == 4 // group and state.C == 256
        assert state.cold_k[0].shape[-1] == group * PC
        assert state.cold_k[0].sharding.memory_kind == "pinned_host"
        tok = int(np.argmax(logits[0]))
        toks = [tok]
        for i in range(3):
            logits, state = eng.decode_step(state, np.array([[tok]], np.int32))
            logits = np.asarray(jax.device_get(logits), np.float32)
            np.testing.assert_allclose(logits, ref_logs[i + 1], rtol=3e-3,
                                       atol=3e-3)
            tok = int(np.argmax(logits[0]))
            toks.append(tok)
        assert toks == ref_toks


def test_tiered_chunked_decode_matches_per_step(lm, eng):
    """decode_chunk (multi-token per dispatch, on-device argmax feedback)
    emits the same greedy stream as per-step decode and the in-HBM path."""
    rng = np.random.default_rng(2)
    ids = rng.integers(2, CFG.vocab_size, (1, 100)).astype(np.int32)
    dict_input = {"input_ids": ids}
    ref_toks, _ = _standard_reference(lm, dict_input, 7)

    toks = eng.generate(dict_input, max_tokens=8, chunk_steps=3)
    assert toks == ref_toks[:8]


def test_tiered_spec_sampling_composes(lm, eng):
    """VERDICT r4 item 5: the tiered (128K-class) path composes speculation
    with SAMPLING via rejection-sampled verification (verify_sampled wired
    into _spec_chunk_fn).

    (a) temperature -> 0 limit: the sampled path degenerates to the greedy
        stream (acceptance and resampling both collapse to argmax), so it
        must match the in-HBM greedy reference token for token.
    (b) moderate temperature: emits the full budget, is reproducible under
        the same seed, and differs across seeds (a random-weight model's
        filtered target is nowhere near deterministic).
    verify_sampled's distribution-exactness itself is pinned by
    tests/test_spec_sampling.py; this test pins the tiered wiring."""
    rng = np.random.default_rng(11)
    pattern = rng.integers(2, CFG.vocab_size, 10).astype(np.int32)
    ids = np.tile(pattern, 14)[None, :130]  # repetitive -> drafts accept
    dict_input = {"input_ids": ids}

    ref_toks, _ = _standard_reference(lm, dict_input, 9)
    cold = eng.spec_generate(
        dict_input, max_tokens=10, k_draft=3, n_iters=3,
        temperature=1e-5, seed=0,
    )
    assert cold == ref_toks[:10]

    warm1 = eng.spec_generate(
        dict_input, max_tokens=10, k_draft=3, n_iters=3,
        temperature=1.0, top_p=0.9, seed=7,
    )
    warm2 = eng.spec_generate(
        dict_input, max_tokens=10, k_draft=3, n_iters=3,
        temperature=1.0, top_p=0.9, seed=7,
    )
    warm3 = eng.spec_generate(
        dict_input, max_tokens=10, k_draft=3, n_iters=3,
        temperature=1.0, top_p=0.9, seed=8,
    )
    assert warm1 == warm2  # same seed reproduces
    assert len(warm1) == 10
    assert all(0 <= t < CFG.vocab_size for t in warm1)
    assert warm1 != warm3  # different seed explores


def test_tiered_bf16_dots_mode(lm, monkeypatch):
    """PHI3V_TPU_TIERED_BF16=1 (the accelerator default) switches the
    attention dots to bf16-input/fp32-accumulate — same numerics class as
    the Pallas kernels.  Logits must stay close to the fp32-dot mode (loose
    tolerance: that IS the traded precision) and the mode must actually
    engage (greedy streams still agree at this scale)."""
    rng = np.random.default_rng(21)
    ids = rng.integers(2, CFG.vocab_size, (1, 100)).astype(np.int32)
    dict_input = {"input_ids": ids}

    def run():
        eng2 = TieredEngine(lm, chunk=PC, hot=HOT, k_block=32)
        logits, state = eng2.prefill(dict_input)
        l0 = np.asarray(logits, np.float32)
        tok = int(np.argmax(l0[0]))
        lg, _ = eng2.decode_step(state, np.array([[tok]], np.int32))
        return l0, np.asarray(jax.device_get(lg), np.float32)

    monkeypatch.setenv("PHI3V_TPU_TIERED_BF16", "0")
    p0, d0 = run()
    monkeypatch.setenv("PHI3V_TPU_TIERED_BF16", "1")
    p1, d1 = run()
    assert not np.array_equal(p0, p1)  # the knob engages
    # bf16 mantissa is 8 bits: on O(1)-scale logits the honest bound is an
    # absolute one (rtol explodes on near-zero entries and means nothing).
    np.testing.assert_allclose(p1, p0, rtol=0, atol=0.15)
    np.testing.assert_allclose(d1, d0, rtol=0, atol=0.15)
    assert np.argmax(p1[0]) == np.argmax(p0[0])
    assert np.argmax(d1[0]) == np.argmax(d0[0])
