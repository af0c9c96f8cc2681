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
    got = [eng.requests[rid].tokens[0]]
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
    seen = [eng.requests[rid].tokens[0]]
    out = eng.step_pipelined(3)
    seen += out.get(rid, [])
    out = eng.step(3)  # must flush the in-flight chunk internally
    seen += out.get(rid, [])
    while eng.pending():
        seen += eng.step(3).get(rid, [])
    assert seen == eng.requests[rid].tokens
