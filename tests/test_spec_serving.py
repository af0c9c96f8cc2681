"""Per-slot speculative decoding in the continuous-batching engine
(engine/batching.py:_spec_decode_chunk).

Contract: with ``spec_k > 0`` every chunk step is a verify pass emitting
1..K+1 tokens per slot, and each request's token stream is BIT-IDENTICAL
to the vanilla engine's (which test_batching.py anchors to single-stream
decoding).
"""

import numpy as np
import pytest

from phi_3_vision_mlx_tpu.api import _load
from phi_3_vision_mlx_tpu.core import weights as W
from phi_3_vision_mlx_tpu.engine.batching import BatchEngine

VOCAB = 32064

PROMPTS = [
    "Tell me about the sea.",
    "tick tock tick tock tick tock",
    "Write a poem in winter.",
]


@pytest.fixture(scope="module")
def lmproc(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("models") / "tiny_spec")
    W.create_random_checkpoint(path, "tiny", vocab_size=VOCAB)
    return _load(path)


def _run(eng, prompts, max_tokens=14, n_steps=2, stagger=False, **submit_kw):
    rids = []
    if stagger:
        rids.append(eng.submit(prompts[0], max_tokens=max_tokens, **submit_kw))
        eng.step(n_steps)
        for p in prompts[1:]:
            rids.append(eng.submit(p, max_tokens=max_tokens, **submit_kw))
    else:
        rids = [
            eng.submit(p, max_tokens=max_tokens, **submit_kw) for p in prompts
        ]
    for _ in range(300):
        if not eng.pending():
            break
        eng.step(n_steps)
    assert not eng.pending()
    return [eng.tokens(r) for r in rids]


def test_spec_matches_vanilla_dense(lmproc):
    lm, proc = lmproc
    base = _run(BatchEngine(lm, proc, slots=3, window=128), PROMPTS)
    spec_eng = BatchEngine(lm, proc, slots=3, window=128, spec_k=7)
    spec = _run(spec_eng, PROMPTS)
    assert spec == base
    st = spec_eng.spec_stats
    assert st["emitted"] >= st["passes"] > 0


def test_spec_matches_vanilla_quantized_cache(lmproc):
    lm, proc = lmproc
    lm = type(lm)(lm.cfg.replace(use_quantized_cache=True), lm.params)
    base = _run(BatchEngine(lm, proc, slots=2, window=128), PROMPTS[:2])
    spec = _run(
        BatchEngine(lm, proc, slots=2, window=128, spec_k=5), PROMPTS[:2]
    )
    assert spec == base


def test_spec_staggered_admission(lmproc):
    """A request admitted mid-decode joins speculative chunks cleanly."""
    lm, proc = lmproc
    base = _run(BatchEngine(lm, proc, slots=2, window=128), PROMPTS[:2],
                stagger=True)
    spec = _run(BatchEngine(lm, proc, slots=2, window=128, spec_k=7),
                PROMPTS[:2], stagger=True)
    assert spec == base


def test_spec_sampling_chunk_stays_speculative(lmproc):
    """r4: chunks with sampling rows no longer fall back to the vanilla
    step — sampled rows verify via rejection sampling (verify_mixed_rows)
    while greedy rows in the same chunk stay bit-exact."""
    lm, proc = lmproc
    base = _run(BatchEngine(lm, proc, slots=1, window=128), [PROMPTS[0]])
    eng = BatchEngine(lm, proc, slots=2, window=128, spec_k=7, seed=7)
    rg = eng.submit(PROMPTS[0], max_tokens=14)
    rs = eng.submit(PROMPTS[2], max_tokens=14, temperature=0.8, top_p=0.9)
    for _ in range(300):
        if not eng.pending():
            break
        eng.step(2)
    assert eng.tokens(rg) == base[0]
    assert eng.spec_stats["passes"] > 0  # mixed chunk used the spec path
    assert len(eng.tokens(rs)) > 0


def test_spec_window_tail_matches_vanilla(lmproc):
    """A slot whose window gets too tight for a verify pass must finish its
    tail through the vanilla step — the full stream stays bit-identical."""
    lm, proc = lmproc
    base = _run(BatchEngine(lm, proc, slots=1, window=128), [PROMPTS[0]],
                max_tokens=80)
    eng = BatchEngine(lm, proc, slots=1, window=128, spec_k=7)
    [spec] = _run(eng, [PROMPTS[0]], max_tokens=80)
    assert spec == base[0]
    assert eng.free == [0]


def test_spec_paged_matches_vanilla(lmproc):
    """Paged-pool speculative decoding: streams bit-identical to the
    vanilla paged engine (which test_batching anchors to single-stream)."""
    from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine

    lm, proc = lmproc
    base = _run(
        PagedBatchEngine(lm, proc, slots=3, window=128, page_size=32),
        PROMPTS,
    )
    eng = PagedBatchEngine(lm, proc, slots=3, window=128, page_size=32,
                           spec_k=7)
    spec = _run(eng, PROMPTS)
    assert spec == base
    st = eng.spec_stats
    assert st["emitted"] >= st["passes"] > 0
    assert len(eng._free_pages) == eng.pool_pages


def test_spec_paged_quantized_cache(lmproc):
    from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine

    lm, proc = lmproc
    lm = type(lm)(lm.cfg.replace(use_quantized_cache=True), lm.params)
    base = _run(
        PagedBatchEngine(lm, proc, slots=2, window=128, page_size=32),
        PROMPTS[:2],
    )
    spec = _run(
        PagedBatchEngine(lm, proc, slots=2, window=128, page_size=32,
                         spec_k=5),
        PROMPTS[:2],
    )
    assert spec == base


def test_spec_paged_preemption_interplay(lmproc):
    """Speculation + an undersized pool: worst-case page reservation forces
    preemption; every request still completes with the exact stream."""
    from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine

    lm, proc = lmproc
    base_eng = PagedBatchEngine(lm, proc, slots=2, window=128, page_size=32,
                                pool_pages=5)
    base = _run(base_eng, PROMPTS[:2], max_tokens=40, n_steps=1)
    eng = PagedBatchEngine(lm, proc, slots=2, window=128, page_size=32,
                           pool_pages=5, spec_k=3)
    spec = _run(eng, PROMPTS[:2], max_tokens=40, n_steps=1)
    assert spec == base
    assert len(eng._free_pages) == eng.pool_pages


def test_spec_acceptance_tiny_vocab():
    """On a small-vocab model greedy generation cycles; the engine must
    then emit >1 token per verify pass, still matching vanilla."""
    import jax

    from phi_3_vision_mlx_tpu.core.config import preset
    from phi_3_vision_mlx_tpu.engine.engine import LM
    from phi_3_vision_mlx_tpu.models import phi3
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3Processor
    from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer

    cfg = preset("tiny")  # vocab 512
    params = phi3.init_params(cfg, jax.random.PRNGKey(3))
    lm = LM(cfg, params)
    proc = Phi3Processor(tokenizer=ByteTokenizer())
    prompts = ["abab", "cdcd"]
    base = _run(BatchEngine(lm, proc, slots=2, window=256), prompts,
                max_tokens=120, n_steps=8)
    eng = BatchEngine(lm, proc, slots=2, window=256, spec_k=7)
    spec = _run(eng, prompts, max_tokens=120, n_steps=8)
    assert spec == base
    st = eng.spec_stats
    assert st["emitted"] / max(st["passes"], 1) > 1.2, st


def test_spec_forced_reject_matches_vanilla(lmproc):
    """``spec_accept=False`` turns every pass into a padded vanilla step
    (one token per pass through the SAME compiled fn the accepting engine
    runs) — the bit-exactness baseline for the uniform-dispatch mode."""
    lm, proc = lmproc
    base = _run(BatchEngine(lm, proc, slots=2, window=128), PROMPTS[:2])
    eng = BatchEngine(lm, proc, slots=2, window=128, spec_k=7,
                      spec_accept=False)
    forced = _run(eng, PROMPTS[:2])
    assert forced == base
    st = eng.spec_stats
    assert st["passes"] > 0 and st["emitted"] == st["passes"]


def test_spec_window_tail_legacy_mode(lmproc):
    """spec_uniform=False: the legacy tail-switch path (whole engine drops
    to lq=1 vanilla chunks when a slot's window gets too tight)."""
    lm, proc = lmproc
    base = _run(BatchEngine(lm, proc, slots=1, window=128), [PROMPTS[0]],
                max_tokens=80)
    eng = BatchEngine(lm, proc, slots=1, window=128, spec_k=7,
                      spec_uniform=False)
    [spec] = _run(eng, [PROMPTS[0]], max_tokens=80)
    assert spec == base[0]
    assert eng.free == [0]


def test_spec_uniform_tail_stays_speculative(lmproc):
    """Uniform mode: window-tail slots decode through forced-reject rows
    inside spec dispatches — _tail_slots never populates and the stream
    still matches vanilla bit-for-bit."""
    lm, proc = lmproc
    base = _run(BatchEngine(lm, proc, slots=1, window=128), [PROMPTS[0]],
                max_tokens=80)
    eng = BatchEngine(lm, proc, slots=1, window=128, spec_k=7,
                      spec_uniform=True)
    [spec] = _run(eng, [PROMPTS[0]], max_tokens=80)
    assert spec == base[0]
    assert eng.free == [0]
    assert not eng._tail_slots


def test_spec_forced_reject_sampled_rows(lmproc):
    """Forced-reject sampling rows draw a plain filtered sample from the
    row-0 logits (vanilla semantics, not the rejection residual)."""
    lm, proc = lmproc
    eng = BatchEngine(lm, proc, slots=2, window=128, spec_k=5,
                      spec_accept=False, seed=11)
    rg = eng.submit(PROMPTS[0], max_tokens=10)
    rs = eng.submit(PROMPTS[1], max_tokens=10, temperature=0.9, top_p=0.9)
    for _ in range(200):
        if not eng.pending():
            break
        eng.step(2)
    assert not eng.pending()
    assert len(eng.tokens(rg)) == 10 and len(eng.tokens(rs)) == 10


def test_spec_paged_uniform_tail_and_forced(lmproc):
    """Paged uniform dispatch: window-tail slots decode through
    forced-reject rows; spec_accept=False is the padded-vanilla baseline."""
    from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine

    lm, proc = lmproc
    base = _run(PagedBatchEngine(lm, proc, slots=1, window=128,
                                 page_size=32), [PROMPTS[0]], max_tokens=80)
    eng = PagedBatchEngine(lm, proc, slots=1, window=128, page_size=32,
                           spec_k=7, spec_uniform=True)
    [spec] = _run(eng, [PROMPTS[0]], max_tokens=80)
    assert spec == base[0]
    assert not eng._tail_slots
    assert len(eng._free_pages) == eng.pool_pages

    forced = _run(
        PagedBatchEngine(lm, proc, slots=2, window=128, page_size=32,
                         spec_k=7, spec_accept=False), PROMPTS[:2]
    )
    base2 = _run(PagedBatchEngine(lm, proc, slots=2, window=128,
                                  page_size=32), PROMPTS[:2])
    assert forced == base2
