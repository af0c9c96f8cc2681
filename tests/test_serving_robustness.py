"""Serving robustness (VERDICT round-2 items 4 & 7): pool-saturation
preemption + recompute resume, pump survival on engine errors, admission via
chunked prefill outside the scheduler lock, per-request sampling, and the
LogitStopper in the slot engines."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phi_3_vision_mlx_tpu.api import _load
from phi_3_vision_mlx_tpu.core import weights as W
from phi_3_vision_mlx_tpu.engine.batching import BatchEngine
from phi_3_vision_mlx_tpu.engine.engine import run_prefill
from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine
from phi_3_vision_mlx_tpu.engine.stream import LogitStopper
from phi_3_vision_mlx_tpu.models import phi3

VOCAB = 32064


@pytest.fixture(scope="module")
def lmproc(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("models") / "tiny_srv")
    W.create_random_checkpoint(path, "tiny", vocab_size=VOCAB)
    return _load(path)


def _single_tokens(lm, proc, prompt, n, window=128, early_stop=False):
    """Greedy single-stream tokens with the prefill window pinned to the
    engine's (same su-rope regime); optional LogitStopper replay in the slot
    engines' order (token appended, then the stats that produced it)."""
    di = proc(prompt)
    l = int(np.asarray(di["input_ids"]).shape[1])
    l_pad = max(-(-l // 64) * 64, 64)
    logits, state, _, _ = run_prefill(lm, di, max_tokens=window - l_pad)
    toks = [int(np.argmax(np.asarray(logits)[0]))]
    stopper = LogitStopper(n, early_stop)
    while len(toks) < n:
        res = phi3.decode_forward(
            lm.params, lm.cfg, state,
            input_ids=jnp.asarray([[toks[-1]]], jnp.int32),
        )
        state = res.state
        lg = np.asarray(res.logits[0, -1].astype(jnp.float32))
        lp = lg - np.log(np.exp(lg - lg.max()).sum()) - lg.max()
        toks.append(int(np.argmax(lg)))
        if stopper.update(float(lp.max()), float(lp[lm.eos_id]), 1):
            break
        if toks[-1] == lm.eos_id:
            break
    if lm.eos_id in toks:
        toks = toks[: toks.index(lm.eos_id)]
    return toks


@pytest.mark.slow
def test_preemption_resume_token_exact(lmproc):
    """Mid-decode pool saturation evicts the youngest request; it resumes by
    recompute when pages free and still emits the single-stream tokens."""
    lm, proc = lmproc
    # Two 64-token prompts need 2 pages each (4 total); growing past 64 and
    # 96 columns wants pages 3 and 4 per slot -> a 5-page pool saturates.
    eng = PagedBatchEngine(lm, proc, slots=2, window=128, page_size=32,
                           pool_pages=5)
    pa, pb = "Preemption test request A.", "Preemption test request B!"
    ra = eng.submit(pa, max_tokens=50)
    rb = eng.submit(pb, max_tokens=50)
    preempted_seen = False
    for _ in range(300):
        if not eng.pending():
            break
        eng.step()
        preempted_seen = preempted_seen or bool(eng.preempted)
    assert not eng.pending()
    assert preempted_seen, "pool never saturated; test misconfigured"
    assert not eng.requests[ra].error and not eng.requests[rb].error
    assert eng.tokens(ra) == _single_tokens(lm, proc, pa, 50)
    assert eng.tokens(rb) == _single_tokens(lm, proc, pb, 50)
    assert len(eng._free_pages) == eng.pool_pages


def test_lone_request_pool_too_small_fails_cleanly(lmproc):
    """A single request whose next chunk cannot ever fit fails with an error
    instead of deadlocking or raising out of step()."""
    lm, proc = lmproc
    eng = PagedBatchEngine(lm, proc, slots=1, window=128, page_size=32,
                           pool_pages=2)  # prompt fills both pages
    rid = eng.submit("Lone request on a starved pool.", max_tokens=80)
    for _ in range(200):
        if not eng.pending():
            break
        eng.step()
    req = eng.requests[rid]
    assert req.done and "pool too small" in req.error
    with pytest.raises(RuntimeError, match="pool too small"):
        eng.result(rid)
    assert len(eng._free_pages) == eng.pool_pages


def test_scheduler_survives_saturation_threads(lmproc):
    """Concurrent requests through a paged scheduler with an undersized pool:
    every request completes (no hang, no dead pump)."""
    import threading

    from phi_3_vision_mlx_tpu.serve.server import ContinuousScheduler

    lm, proc = lmproc
    sched = ContinuousScheduler(lm, proc, slots=3, window=128, paged=True,
                                page_size=32, pool_pages=8)
    prompts = [f"Saturation request number {i}." for i in range(4)]
    results = {}

    def worker(p):
        results[p] = sched.complete(p, max_tokens=40)

    threads = [threading.Thread(target=worker, args=(p,)) for p in prompts]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
        assert not t.is_alive(), "scheduler deadlocked under saturation"
    for p in prompts:
        assert isinstance(results[p], str)


def test_impossible_prompt_raises_not_hangs(lmproc):
    """A prompt needing more pages than the WHOLE pool must raise from
    can_admit (a scheduler looping on it would otherwise hang its caller
    forever) — and from submit()'s direct admission path."""
    lm, proc = lmproc
    eng = PagedBatchEngine(lm, proc, slots=1, window=256, page_size=64,
                           pool_pages=1)
    prepared = eng.prepare("word " * 20, max_tokens=8)  # ~128 cols: 2 pages
    with pytest.raises(ValueError, match="pool"):
        eng.can_admit(prepared)
    with pytest.raises(RuntimeError, match="exhausted"):
        eng.admit(prepared)
    assert len(eng._free_pages) == eng.pool_pages
    assert eng.free == [0]


def test_preempted_requests_have_resume_priority(lmproc):
    """While the preempted queue is non-empty, can_admit refuses new
    requests so freed slots/pages go to resumes first."""
    lm, proc = lmproc
    eng = PagedBatchEngine(lm, proc, slots=2, window=128, page_size=32,
                           pool_pages=5)
    ra = eng.submit("Priority test request A.", max_tokens=50)
    rb = eng.submit("Priority test request B!", max_tokens=50)
    newcomer = eng.prepare("Newcomer request.", max_tokens=8)
    saw_block = False
    for _ in range(300):
        if not eng.pending():
            break
        eng.step()
        if eng.preempted:
            assert not eng.can_admit(newcomer)
            saw_block = True
    assert saw_block, "pool never saturated; test misconfigured"
    assert eng.tokens(ra) and eng.tokens(rb)
    assert eng.can_admit(newcomer)  # queue drained -> admission reopens


def test_failed_adoption_releases_pages(lmproc):
    """If the device adoption call raises, the slot AND its freshly
    allocated pages must return to the pool."""
    lm, proc = lmproc
    eng = PagedBatchEngine(lm, proc, slots=1, window=128, page_size=32,
                           pool_pages=4)
    prepared = eng.prepare("Adoption failure test.", max_tokens=8)
    prepared.src_state = None  # poison: the jitted adopt call will raise
    with pytest.raises(Exception):
        eng.admit(prepared)
    assert eng.free == [0]
    assert len(eng._free_pages) == eng.pool_pages
    assert eng._slot_pages == {}


def test_pump_survives_engine_error(lmproc):
    """An exception out of engine.step fails the owning request (surfaced to
    its caller) but the pump keeps serving later requests."""
    from phi_3_vision_mlx_tpu.serve.server import ContinuousScheduler

    lm, proc = lmproc
    sched = ContinuousScheduler(lm, proc, slots=2, window=128)
    orig_step = sched.engine.step
    orig_pipelined = sched.engine.step_pipelined
    calls = {"n": 0}

    def make_flaky(orig):
        def flaky(n_steps=1):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected failure")
            return orig(n_steps)
        return flaky

    # The pump steps via step_pipelined by default (step without it);
    # poison whichever it picks.
    sched.engine.step = make_flaky(orig_step)
    sched.engine.step_pipelined = make_flaky(orig_pipelined)
    with pytest.raises(RuntimeError, match="injected failure"):
        sched.complete("This request hits the injected fault.", 8)
    out = sched.complete("This one must still be served.", 8)
    assert isinstance(out, str)
    assert calls["n"] >= 2


def test_chunked_prefill_admission(lmproc, monkeypatch):
    """A prompt longer than the prefill chunk admits via chunked prefill
    (prepare -> extend_fn loop) and decodes token-exactly."""
    from phi_3_vision_mlx_tpu.engine import engine as engine_mod

    monkeypatch.setattr(engine_mod, "PREFILL_CHUNK", 64)
    lm, proc = lmproc
    prompt = "A much longer admission prompt. " * 5  # l_pad > one 64-tok chunk
    eng = BatchEngine(lm, proc, slots=2, window=512)
    rid = eng.submit(prompt, max_tokens=10)
    while eng.pending():
        eng.step()
    assert eng.tokens(rid) == _single_tokens(lm, proc, prompt, 10, window=512)


def test_per_slot_sampling_isolates_greedy_rows(lmproc):
    """A sampled request sharing the batch must not perturb its greedy
    neighbor (temp<=0 rows are exact argmax even in the sampling-compiled
    step), and sampling is reproducible per seed."""
    lm, proc = lmproc
    pa, pb = "Greedy neighbor prompt.", "Sampled neighbor prompt!"

    eng = BatchEngine(lm, proc, slots=2, window=128, seed=7)
    ra = eng.submit(pa, max_tokens=12)
    rb = eng.submit(pb, max_tokens=12, temperature=0.8, top_p=0.9)
    while eng.pending():
        eng.step()
    assert eng.tokens(ra) == _single_tokens(lm, proc, pa, 12)
    toks_b = eng.tokens(rb)
    assert toks_b and all(0 <= t < VOCAB for t in toks_b)

    eng2 = BatchEngine(lm, proc, slots=2, window=128, seed=7)
    ra2 = eng2.submit(pa, max_tokens=12)
    rb2 = eng2.submit(pb, max_tokens=12, temperature=0.8, top_p=0.9)
    while eng2.pending():
        eng2.step()
    assert eng2.tokens(rb2) == toks_b, "same seed must reproduce samples"


@pytest.mark.slow
def test_sampling_temp_zero_token_exact_paged(lmproc):
    """temperature=0 / top_p=1 through the paged engine's sampling path is
    token-exact greedy (VERDICT item 7's gate)."""
    lm, proc = lmproc
    eng = PagedBatchEngine(lm, proc, slots=2, window=128, page_size=32,
                           pool_pages=8)
    pa = "Exact greedy through sampling path."
    ra = eng.submit(pa, max_tokens=12, temperature=0.0, top_p=1.0)
    # a sampled neighbor forces the sampling-compiled step
    rb = eng.submit("Neighbor!", max_tokens=12, temperature=1.2, top_p=0.5)
    while eng.pending():
        eng.step()
    assert eng.tokens(ra) == _single_tokens(lm, proc, pa, 12)


@pytest.mark.slow
def test_slot_engine_logit_stopper(lmproc):
    """early_stop in the slot engine replays the single-stream LogitStopper
    decision exactly (same stats, same step order)."""
    lm, proc = lmproc
    prompt = "Early stopping slot request."
    want = _single_tokens(lm, proc, prompt, 64, early_stop=1)
    eng = BatchEngine(lm, proc, slots=1, window=128)
    rid = eng.submit(prompt, max_tokens=64, early_stop=1)
    while eng.pending():
        eng.step()
    assert eng.tokens(rid) == want


def test_batched_prefill_admission_token_exact(lmproc):
    """prepare_many (one dispatch for several queued admissions) produces
    the same tokens as one-prompt-per-dispatch prepare()+admit()."""
    lm, proc = lmproc
    prompts = ["Tell me about the sea.", "Write a poem in winter.",
               "Explain tides briefly."]

    ref = BatchEngine(lm, proc, slots=3, window=128)
    ref_rids = [ref.submit(p, max_tokens=8) for p in prompts]
    while ref.pending():
        ref.step(2)
    want = [ref.result(r) for r in ref_rids]

    eng = BatchEngine(lm, proc, slots=3, window=128)
    prepared = eng.prepare_many(prompts, [dict(max_tokens=8)] * 3)
    assert [p.src_row for p in prepared] == [0, 1, 2]
    rids = [eng.admit(p) for p in prepared]
    while eng.pending():
        eng.step(2)
    got = [eng.result(r) for r in rids]
    assert got == want


def test_batched_prefill_admission_paged(lmproc):
    """Same through the paged engine (page scatter + src_row slicing)."""
    lm, proc = lmproc
    prompts = ["Tell me about the sea.", "Explain tides briefly."]
    ref = PagedBatchEngine(lm, proc, slots=2, window=128, page_size=64,
                           pool_pages=4)
    want = []
    ra, rb = [ref.submit(p, max_tokens=6) for p in prompts]
    while ref.pending():
        ref.step(2)
    want = [ref.result(ra), ref.result(rb)]

    eng = PagedBatchEngine(lm, proc, slots=2, window=128, page_size=64,
                           pool_pages=4)
    prepared = eng.prepare_many(prompts, [dict(max_tokens=6)] * 2)
    rids = [eng.admit(p) for p in prepared]
    while eng.pending():
        eng.step(2)
    assert [eng.result(r) for r in rids] == want


def test_scheduler_batches_burst_admissions(lmproc, monkeypatch):
    """A burst of concurrent requests through the ContinuousScheduler is
    admitted via prepare_many (spy) and every request completes correctly."""
    import threading

    from phi_3_vision_mlx_tpu.serve.server import ContinuousScheduler

    lm, proc = lmproc
    monkeypatch.setenv("PHI3V_TPU_ADMIT_BATCH", "4")
    sched = ContinuousScheduler(lm, proc, slots=4, window=128)
    calls = []
    orig = sched.engine.prepare_many

    def spy(prompts, opts):
        calls.append(len(prompts))
        return orig(prompts, opts)

    sched.engine.prepare_many = spy
    prompts = [f"Prompt number {i} about stars." for i in range(6)]
    results = [None] * len(prompts)

    def worker(i):
        results[i] = sched.complete(prompts[i], max_tokens=6)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert all(r is not None for r in results)
    assert sum(calls) == 6
    assert max(calls) > 1  # at least one genuinely batched dispatch
    # correctness: each result matches its own single-stream decode
    for i in (0, 3):
        eng = BatchEngine(lm, proc, slots=1, window=128)
        rid = eng.submit(prompts[i], max_tokens=6)
        while eng.pending():
            eng.step(2)
        assert results[i] == eng.result(rid)
