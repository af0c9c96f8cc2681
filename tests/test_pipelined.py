"""Pipelined chunk decode (dispatch next before collecting previous):
token-exact vs the synchronous step path, across mid-flight admissions,
page-pool pressure (preemption + the in-reserve flush), and speculation.

Reference has no serving engine; this covers the TPU-native latency-hiding
layer (engine/batching.py step_pipelined, engine/paging.py _reserve).
"""

import pytest

from phi_3_vision_mlx_tpu.api import _load
from phi_3_vision_mlx_tpu.core import weights as W
from phi_3_vision_mlx_tpu.engine.batching import BatchEngine
from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine

VOCAB = 32064


@pytest.fixture(scope="module")
def lmproc(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("models") / "tiny_pipe")
    W.create_random_checkpoint(path, "tiny", vocab_size=VOCAB)
    return _load(path)


def _admit_ready(eng, queue, rids):
    """prepare+admit queued requests while the engine can take them."""
    while queue:
        p, n = queue[0]
        prepared = eng.prepare(p, max_tokens=n)
        if not eng.can_admit(prepared):
            break
        queue.pop(0)
        rids.append(eng.admit(prepared))


def _run_sync(eng_factory, submits, chunk=4):
    eng = eng_factory()
    queue = list(submits)
    rids = []
    while queue or eng.pending():
        _admit_ready(eng, queue, rids)
        eng.step(chunk)
    return eng, rids


def _run_pipelined(eng_factory, submits, chunk=4, stagger=0):
    """Drive with step_pipelined; optionally admit later requests only after
    ``stagger`` ticks (mid-flight admission into a freed/fresh slot)."""
    eng = eng_factory()
    queue = list(submits)
    p0, n0 = queue.pop(0)
    rids = [eng.submit(p0, max_tokens=n0)]
    ticks = 0
    while queue or eng.pending():
        if ticks >= stagger:
            _admit_ready(eng, queue, rids)
        eng.step_pipelined(chunk)
        ticks += 1
    eng.flush()  # final in-flight chunk (usually already drained)
    return eng, rids


PROMPTS = [
    ("Tell me about the sea.", 12),
    ("Write a poem in winter!", 10),
    ("Gamma prompt three?", 14),
    ("Fourth request, short.", 8),
]


def test_pipelined_matches_sync_base(lmproc):
    lm, proc = lmproc
    factory = lambda: BatchEngine(lm, proc, slots=2, window=128)  # noqa: E731
    es, rs = _run_sync(factory, PROMPTS)
    ep, rp = _run_pipelined(factory, PROMPTS, stagger=1)
    sync_tokens = sorted(tuple(es.tokens(r)) for r in rs)
    pipe_tokens = sorted(tuple(ep.tokens(r)) for r in rp)
    assert sync_tokens == pipe_tokens


def test_pipelined_step_return_covers_all_tokens(lmproc):
    """Every emitted token shows up exactly once across step_pipelined()
    returns (streaming callers lose nothing to the pipeline)."""
    lm, proc = lmproc
    eng = BatchEngine(lm, proc, slots=2, window=128)
    rid = eng.submit("Stream accounting prompt.", max_tokens=9)
    got = [eng.first_token(rid)]
    while eng.pending():
        got.extend(eng.step_pipelined(3).get(rid, []))
    assert got == eng.requests[rid].tokens
    assert len(got) <= 9


def test_depth_pipelined_matches_sync(lmproc):
    """depth=3 (several chunks in flight, for long dispatch round trips)
    emits the same per-request streams as the synchronous path, across
    mid-flight admissions, and wastes at most depth chunks per finish."""
    lm, proc = lmproc
    factory = lambda: BatchEngine(lm, proc, slots=2, window=128,  # noqa: E731
                                  pipeline_depth=3)
    es, rs = _run_sync(lambda: BatchEngine(lm, proc, slots=2, window=128),
                       PROMPTS)
    ep, rp = _run_pipelined(factory, PROMPTS, stagger=2)
    sync_tokens = sorted(tuple(es.tokens(r)) for r in rs)
    pipe_tokens = sorted(tuple(ep.tokens(r)) for r in rp)
    assert sync_tokens == pipe_tokens


def test_depth_pipelined_paged_with_preemption(lmproc):
    """depth=2 over the paged pool: the reserve path must count EVERY
    uncollected chunk's worst-case growth before allocating."""
    lm, proc = lmproc
    submits = [("Preempt pressure one two three.", 20),
               ("Second request under pressure.", 20)]
    sync_f = lambda: PagedBatchEngine(  # noqa: E731
        lm, proc, slots=2, window=256, page_size=32, pool_pages=5)
    deep_f = lambda: PagedBatchEngine(  # noqa: E731
        lm, proc, slots=2, window=256, page_size=32, pool_pages=5,
        pipeline_depth=2)
    es, rs = _run_sync(sync_f, submits, chunk=4)
    ep, rp = _run_pipelined(deep_f, submits, chunk=4, stagger=1)
    sync_tokens = sorted(tuple(es.tokens(r)) for r in rs)
    pipe_tokens = sorted(tuple(ep.tokens(r)) for r in rp)
    assert sync_tokens == pipe_tokens


def test_pipelined_matches_sync_paged_with_preemption(lmproc):
    """A pool sized to force preemption mid-run: the pipelined path must
    flush-then-preempt and still finish every request with the same tokens
    as the synchronous path."""
    lm, proc = lmproc
    submits = [("Preempt pressure one two three.", 24),
               ("Second request under pressure.", 24)]
    factory = lambda: PagedBatchEngine(  # noqa: E731
        lm, proc, slots=2, window=256, page_size=32, pool_pages=5)
    es, rs = _run_sync(factory, submits, chunk=4)
    ep, rp = _run_pipelined(factory, submits, chunk=4, stagger=1)
    sync_tokens = sorted(tuple(es.tokens(r)) for r in rs)
    pipe_tokens = sorted(tuple(ep.tokens(r)) for r in rp)
    assert sync_tokens == pipe_tokens
    # the pressure actually exercised the reserve path on at least one side
    assert es.pool_pages == ep.pool_pages == 5


def test_pipelined_spec_matches_vanilla(lmproc):
    """Speculative slot decoding pipelines too: emitted streams equal the
    vanilla engine's greedy streams."""
    lm, proc = lmproc
    prompts = [("repeat repeat repeat repeat repeat", 12),
               ("the the the the the", 12)]
    vanilla = BatchEngine(lm, proc, slots=2, window=128)
    rv = [vanilla.submit(p, max_tokens=n) for p, n in prompts]
    while vanilla.pending():
        vanilla.step(4)
    spec = BatchEngine(lm, proc, slots=2, window=128, spec_k=3)
    rp = [spec.submit(p, max_tokens=n) for p, n in prompts]
    while spec.pending():
        spec.step_pipelined(2)
    spec.flush()
    for a, b in zip(rv, rp):
        assert vanilla.tokens(a) == spec.tokens(b)


def test_mixed_step_and_pipelined(lmproc):
    """Interleaving step() and step_pipelined() is safe: step() flushes the
    in-flight chunk first, so no tokens are lost or duplicated."""
    lm, proc = lmproc
    eng = BatchEngine(lm, proc, slots=2, window=128)
    rid = eng.submit("Mixed stepping modes prompt.", max_tokens=10)
    seen = [eng.first_token(rid)]
    out = eng.step_pipelined(3)
    seen += out.get(rid, [])
    out = eng.step(3)  # must flush the in-flight chunk internally
    seen += out.get(rid, [])
    while eng.pending():
        seen += eng.step(3).get(rid, [])
    assert seen == eng.requests[rid].tokens


def test_proactive_completion_frees_slot_early(lmproc):
    """_project_completions: a max_tokens-bound request's slot returns to
    ``free`` as soon as the in-flight chunks cover its remaining budget —
    BEFORE collect() sees the finish — and a new request admitted into the
    freed slot decodes correctly while the old one's tokens still drain."""
    lm, proc = lmproc
    eng = BatchEngine(lm, proc, slots=1, window=128, pipeline_depth=2)
    rid0 = eng.submit("First request, chunk-aligned.", max_tokens=8)
    # 1 token emitted at admission; two 4-step chunks cover the remaining 7.
    eng.step_pipelined(4)  # chunk 1 in flight
    assert not eng.free  # 1 + 4 < 8: not projectable yet
    eng.step_pipelined(4)  # chunk 2 in flight -> 1 + 8 >= 8: projected done
    assert eng.free == [0]
    assert not eng.requests[rid0].done  # tokens still in flight
    # admit into the projected-free slot while old chunks are in flight
    rid1 = eng.submit("Second request takes the slot.", max_tokens=6)
    while eng.pending():
        eng.step_pipelined(4)
    eng.flush()
    assert eng.requests[rid0].done and eng.requests[rid1].done
    assert len(eng.tokens(rid0)) <= 8 and eng.tokens(rid1)
    # streams match a fresh non-pipelined run of the same prompts
    ref = BatchEngine(lm, proc, slots=1, window=128)
    ra = ref.submit("First request, chunk-aligned.", max_tokens=8)
    while ref.by_slot:
        ref.step(4)
    rb = ref.submit("Second request takes the slot.", max_tokens=6)
    while ref.by_slot:
        ref.step(4)
    assert eng.tokens(rid0) == ref.tokens(ra)
    assert eng.tokens(rid1) == ref.tokens(rb)
    # no double-free: exactly one slot, free exactly once
    assert eng.free == [0]


def test_proactive_completion_paged_pages_recycle(lmproc):
    """Paged engine: proactively freed pages are re-allocated to the next
    request while the old request's chunks are still in flight; both
    streams stay token-exact (write ordering on the device stream)."""
    lm, proc = lmproc
    factory = lambda: PagedBatchEngine(  # noqa: E731
        lm, proc, slots=2, window=256, page_size=32, pool_pages=8,
        pipeline_depth=2)
    # chunk-aligned max_tokens => every finish is projected
    submits = [("Alpha prompt for page recycling.", 9),
               ("Beta prompt arrives later on.", 9),
               ("Gamma prompt fills the freed slot.", 9)]
    es, rs = _run_sync(
        lambda: PagedBatchEngine(lm, proc, slots=2, window=256,
                                 page_size=32, pool_pages=8),
        submits, chunk=4)
    ep, rp = _run_pipelined(factory, submits, chunk=4, stagger=1)
    assert sorted(tuple(es.tokens(r)) for r in rs) == \
        sorted(tuple(ep.tokens(r)) for r in rp)
    # page accounting intact after recycling: all pages back in the pool
    assert sorted(ep._free_pages) == list(range(8))


def test_proactive_completion_fail_all_reaches_freed_requests(lmproc):
    """fail_all_active must also fail requests whose slots were proactively
    freed (they are not in by_slot but still owe in-flight tokens)."""
    lm, proc = lmproc
    eng = BatchEngine(lm, proc, slots=1, window=128, pipeline_depth=2)
    rid = eng.submit("Failure propagation prompt.", max_tokens=8)
    eng.step_pipelined(4)
    eng.step_pipelined(4)
    assert eng.free == [0] and not eng.requests[rid].done
    eng.fail_all_active("simulated engine error")
    assert eng.requests[rid].done and eng.requests[rid].error
