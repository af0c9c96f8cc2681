"""Continuous-batching engine: per-slot offsets, left-pad rope positions,
mid-run admission, slot reuse — token-exact vs single-stream decoding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phi_3_vision_mlx_tpu.api import _load
from phi_3_vision_mlx_tpu.core import weights as W
from phi_3_vision_mlx_tpu.engine.batching import BatchEngine
from phi_3_vision_mlx_tpu.engine.engine import run_prefill
from phi_3_vision_mlx_tpu.models import phi3

VOCAB = 32064


@pytest.fixture(scope="module")
def lmproc(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("models") / "tiny_batch")
    W.create_random_checkpoint(path, "tiny", vocab_size=VOCAB)
    return _load(path)


def _single_tokens(lm, proc, prompt, n, window=128):
    """Greedy tokens via the ordinary single-stream path, with the prefill
    window pinned to the engine's so su-rope regimes agree."""
    di = proc(prompt)
    l = int(np.asarray(di["input_ids"]).shape[1])
    l_pad = max(-(-l // 64) * 64, 64)
    logits, state, _, _ = run_prefill(lm, di, max_tokens=window - l_pad)
    toks = [int(np.argmax(np.asarray(logits)[0]))]
    for _ in range(n - 1):
        res = phi3.decode_forward(
            lm.params, lm.cfg, state,
            input_ids=jnp.asarray([[toks[-1]]], jnp.int32),
        )
        state = res.state
        toks.append(int(np.argmax(np.asarray(res.logits)[0, -1])))
        if toks[-1] == lm.eos_id:
            break
    if lm.eos_id in toks:
        toks = toks[: toks.index(lm.eos_id)]
    return toks


def test_two_requests_match_single_stream(lmproc):
    lm, proc = lmproc
    eng = BatchEngine(lm, proc, slots=2, window=128)
    pa, pb = "Tell me about the sea.", "Write a poem in winter."
    ra = eng.submit(pa, max_tokens=12)
    rb = eng.submit(pb, max_tokens=12)
    while eng.pending():
        eng.step()
    assert eng.tokens(ra) == _single_tokens(lm, proc, pa, 12)
    assert eng.tokens(rb) == _single_tokens(lm, proc, pb, 12)


@pytest.mark.slow
def test_mid_run_admission_and_slot_reuse(lmproc):
    """A request admitted while another is mid-decode must not perturb it,
    and freed slots must serve later requests correctly."""
    lm, proc = lmproc
    eng = BatchEngine(lm, proc, slots=2, window=128)
    pa, pb, pc = "Alpha prompt one.", "Beta prompt two!", "Gamma prompt three?"
    ra = eng.submit(pa, max_tokens=10)
    for _ in range(3):
        eng.step()
    rb = eng.submit(pb, max_tokens=10)  # joins mid-run
    while eng.pending():
        eng.step()
    rc = eng.submit(pc, max_tokens=8)  # reuses a freed slot
    while eng.pending():
        eng.step()
    assert eng.tokens(ra) == _single_tokens(lm, proc, pa, 10)
    assert eng.tokens(rb) == _single_tokens(lm, proc, pb, 10)
    assert eng.tokens(rc) == _single_tokens(lm, proc, pc, 8)


def test_continuous_scheduler_threads(lmproc):
    """Three concurrent requests through 2 slots: no deadlock, results match
    a plain BatchEngine run of the same prompts."""
    import threading

    from phi_3_vision_mlx_tpu.serve.server import ContinuousScheduler

    lm, proc = lmproc
    sched = ContinuousScheduler(lm, proc, slots=2, window=128)
    prompts = ["First request.", "Second request!", "Third request?"]
    results = {}

    def worker(p):
        results[p] = sched.complete(p, max_tokens=8)

    threads = [threading.Thread(target=worker, args=(p,)) for p in prompts]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "scheduler deadlocked"

    ref = BatchEngine(lm, proc, slots=1, window=128)
    for p in prompts:
        rid = ref.submit(p, max_tokens=8)
        while ref.pending():
            ref.step()
        assert results[p] == ref.result(rid), p


def test_quantized_cache_batching(lmproc, tmp_path):
    """BatchEngine over the packed int4 quantized cache: token-exact vs
    single-stream quantized decoding (same quantize-at-write bytes)."""
    lm0, proc = lmproc
    from phi_3_vision_mlx_tpu.engine.engine import LM

    cfg_q = lm0.cfg.replace(use_quantized_cache=True)
    lm = LM(cfg_q, lm0.params)
    eng = BatchEngine(lm, proc, slots=2, window=128)
    pa, pb = "Quantized request A.", "Quantized request B!"
    ra = eng.submit(pa, max_tokens=10)
    rb = eng.submit(pb, max_tokens=10)
    while eng.pending():
        eng.step()
    assert eng.tokens(ra) == _single_tokens(lm, proc, pa, 10)
    assert eng.tokens(rb) == _single_tokens(lm, proc, pb, 10)


@pytest.mark.slow
def test_paged_engine_matches_single_stream(lmproc):
    """Paged pool at HALF the dense reservation serves the same requests
    token-exactly, including mid-run admission, page growth across
    boundaries, and page reuse after completion."""
    from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine

    lm, proc = lmproc
    eng = PagedBatchEngine(
        lm, proc, slots=2, window=128, page_size=32,
        pool_pages=2 * (128 // 32) // 2 + 2,  # half reservation + slack
    )
    pa, pb, pc = "Paged request one.", "Paged request two!", "Paged request 3?"
    ra = eng.submit(pa, max_tokens=40)  # crosses a 32-col page boundary
    for _ in range(3):
        eng.step()
    rb = eng.submit(pb, max_tokens=10)
    while eng.pending():
        eng.step()
    rc = eng.submit(pc, max_tokens=8)  # reuses freed pages
    while eng.pending():
        eng.step()
    assert eng.tokens(ra) == _single_tokens(lm, proc, pa, 40)
    assert eng.tokens(rb) == _single_tokens(lm, proc, pb, 10)
    assert eng.tokens(rc) == _single_tokens(lm, proc, pc, 8)
    # all pages returned
    assert len(eng._free_pages) == eng.pool_pages


@pytest.mark.slow
def test_paged_partial_page_adoption(lmproc):
    """page_size larger than the 64-token prompt bucket: adoption allocates
    ceil(l_pad/page) pages, zero-fills the trailing partial page (l_pad=64,
    page=128), and decode continues into it token-exactly."""
    from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine

    lm, proc = lmproc
    eng = PagedBatchEngine(lm, proc, slots=2, window=256, page_size=128,
                           pool_pages=4)
    pa = "Partial page prompt."
    ra = eng.submit(pa, max_tokens=12)
    while eng.pending():
        eng.step()
    assert eng.tokens(ra) == _single_tokens(lm, proc, pa, 12, window=256)
    assert len(eng._free_pages) == 4


def test_paged_pool_exhaustion_raises(lmproc):
    from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine

    lm, proc = lmproc
    eng = PagedBatchEngine(lm, proc, slots=2, window=128, page_size=32,
                           pool_pages=1)  # a 64-token prompt needs 2 pages
    with pytest.raises(RuntimeError):
        eng.submit("This prompt needs more pages than the pool has.",
                   max_tokens=100)
    assert len(eng._free_pages) == 1 and len(eng.free) == 2


@pytest.mark.slow
def test_paged_engine_quantized_cache(lmproc):
    """Paged pool over the packed int4 quantized cache: token-exact vs
    single-stream quantized decoding."""
    from phi_3_vision_mlx_tpu.engine.engine import LM
    from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine

    lm0, proc = lmproc
    lm = LM(lm0.cfg.replace(use_quantized_cache=True), lm0.params)
    eng = PagedBatchEngine(lm, proc, slots=2, window=128, page_size=32,
                           pool_pages=6)
    pa, pb = "Quantized paged A.", "Quantized paged B!"
    ra = eng.submit(pa, max_tokens=12)
    rb = eng.submit(pb, max_tokens=12)
    while eng.pending():
        eng.step()
    assert eng.tokens(ra) == _single_tokens(lm, proc, pa, 12)
    assert eng.tokens(rb) == _single_tokens(lm, proc, pb, 12)
    assert len(eng._free_pages) == 6


@pytest.mark.parametrize("paged", [False, True])
def test_chunked_steps_match_single_steps(lmproc, paged):
    """step(n) must emit exactly the tokens n x step(1) would, for both
    engines, including a request finishing mid-chunk."""
    if paged:
        from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine as Eng

        kw = dict(page_size=32, pool_pages=8)
    else:
        Eng = BatchEngine
        kw = {}
    lm, proc = lmproc
    pa, pb = "Chunked decode A.", "Chunked decode B?"

    eng1 = Eng(lm, proc, slots=2, window=128, **kw)
    ra1, rb1 = eng1.submit(pa, max_tokens=11), eng1.submit(pb, max_tokens=17)
    while eng1.pending():
        eng1.step(1)

    eng8 = Eng(lm, proc, slots=2, window=128, **kw)
    ra8, rb8 = eng8.submit(pa, max_tokens=11), eng8.submit(pb, max_tokens=17)
    while eng8.pending():
        eng8.step(8)  # 11 and 17 both finish mid-chunk

    assert eng8.tokens(ra8) == eng1.tokens(ra1)
    assert eng8.tokens(rb8) == eng1.tokens(rb1)
