"""Stop sequences: text-level stop-string matching (beyond the reference,
which stops on EOS / logit heuristics only) — unit semantics plus the
single-stream and slot-engine integrations."""

import numpy as np
import pytest

from phi_3_vision_mlx_tpu.engine.stream import StopSequences
from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer

VOCAB = 32064


@pytest.fixture(scope="module")
def lmproc(tmp_path_factory):
    from phi_3_vision_mlx_tpu.api import _load
    from phi_3_vision_mlx_tpu.core import weights as W

    path = str(tmp_path_factory.mktemp("models") / "tiny_stop")
    W.create_random_checkpoint(path, "tiny", vocab_size=VOCAB)
    return _load(path)


def _bt(ch: str) -> int:
    return 1000 + ord(ch)


def test_stop_matches_across_token_boundaries():
    """Stop string "ab" split over two tokens still fires (text matching)."""
    ss = StopSequences(ByteTokenizer(), "ab", 1)
    assert not ss.update(np.array([_bt("a")]))
    assert ss.update(np.array([_bt("b")]))


def test_stop_batch_requires_all_rows():
    ss = StopSequences(ByteTokenizer(), ["x"], 2)
    assert not ss.update(np.array([_bt("x"), _bt("y")]))  # row 1 not hit
    assert ss.update(np.array([_bt("z"), _bt("x")]))


def test_trim_cuts_at_earliest_stop():
    ss = StopSequences(ByteTokenizer(), ["###", "@@"], 1)
    assert ss.trim_text("hello@@world###tail") == "hello"
    assert ss.trim_text("no stops here") == "no stops here"
    assert ss.trim(["a###b", "c"]) == ["a", "c"]


def test_disabled_without_stops():
    ss = StopSequences(ByteTokenizer(), None, 1)
    assert not ss
    assert not ss.update(np.array([_bt("a")]))
    assert ss.trim("unchanged") == "unchanged"


def test_generate_stop_trims_and_halts(lmproc):
    """A stop string drawn from the middle of the greedy output makes
    generate() return the prefix before it."""
    from phi_3_vision_mlx_tpu.api import generate

    kw = dict(preload=lmproc, max_tokens=12, verbose=False, stream=False,
              mute=True)
    full = generate("Hello there", **kw)[0]
    assert len(full) > 8, full
    mid = full[len(full) // 2 :][:6]  # a substring the decode will hit
    out = generate("Hello there", stop=[mid], **kw)[0]
    assert mid not in out
    assert full.startswith(out)
    assert len(out) < len(full)


def test_batch_engine_stop(lmproc):
    """Per-request stop strings in the slot engine: the stopped request
    frees its slot early and its text is trimmed; a no-stop request in the
    same batch is untouched."""
    from phi_3_vision_mlx_tpu.engine.batching import BatchEngine

    lm, proc = lmproc
    pa, pb = "Tell me about the sea.", "Write a poem in winter."
    ref = BatchEngine(lm, proc, slots=2, window=128)
    ra = ref.submit(pa, max_tokens=10)
    rb = ref.submit(pb, max_tokens=10)
    while ref.pending():
        ref.step(2)
    full_a, full_b = ref.result(ra), ref.result(rb)
    mid = full_a[len(full_a) // 2 :][:6]

    eng = BatchEngine(lm, proc, slots=2, window=128)
    sa = eng.submit(pa, max_tokens=10, stop=[mid])
    sb = eng.submit(pb, max_tokens=10)
    while eng.pending():
        eng.step(2)
    out_a = eng.result(sa)
    assert mid not in out_a and full_a.startswith(out_a)
    assert len(eng.tokens(sa)) < len(ref.tokens(ra)) + 1
    assert eng.result(sb) == full_b
