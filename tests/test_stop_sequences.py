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


def test_validate_stops_rejects_bad_input():
    from phi_3_vision_mlx_tpu.engine.stream import validate_stops

    assert validate_stops(None) == []
    assert validate_stops("ab") == ["ab"]
    assert validate_stops(("x", "y")) == ["x", "y"]
    for bad in ["", [""], [3], {"a": 1}, b"ab", ["ok", None]]:
        with pytest.raises(ValueError):
            validate_stops(bad)
    with pytest.raises(ValueError):
        validate_stops(["s"] * 17)


def test_streamer_streams_with_stop_holdback(capsys):
    """Stream mode with stops: prints incrementally, never past the stop,
    and the total printed text equals the trimmed text."""
    from phi_3_vision_mlx_tpu.engine.stream import Streamer

    tok = ByteTokenizer()
    st = Streamer(tok, stream=True, mute=False, stops=["##"])
    text = "one two three ## never shown"
    for ch in text:
        st(np.array([[_bt(ch)]]))
        printed = capsys.readouterr().out
        assert "#" not in printed and "never" not in printed
    mid_seen = st.idx_sofar
    assert mid_seen > 0  # something streamed before the end
    txt, _ = st.end()
    tail = capsys.readouterr().out
    assert "never" not in tail
    assert txt == text  # raw text untouched; caller trims the return value


def test_generate_stream_with_stop_prints_trimmed(lmproc, capsys):
    """generate(stream=True, stop=...) streams AND the printed text equals
    the trimmed return value (ADVICE r3 medium: used to print untrimmed)."""
    from phi_3_vision_mlx_tpu.api import generate

    full = generate("Hello there", stream=False, mute=True, preload=lmproc,
                    max_tokens=12, verbose=False)[0]
    mid = full[len(full) // 2 :][:6]
    capsys.readouterr()
    out = generate("Hello there", stream=True, stop=[mid], preload=lmproc,
                   max_tokens=12, verbose=False, mute=False)
    printed = capsys.readouterr().out
    assert isinstance(out, str) and mid not in out
    assert printed.rstrip() == out.rstrip()  # printed stream == trimmed return


def test_batch_mode_print_is_trimmed(lmproc, capsys):
    """Batch (stream=False, mute=False) console output is trimmed at the
    stop, matching the return value (ADVICE r3 medium)."""
    from phi_3_vision_mlx_tpu.api import generate

    kw = dict(preload=lmproc, max_tokens=12, verbose=False, stream=False)
    full = generate("Hello there", mute=True, **kw)[0]
    mid = full[len(full) // 2 :][:6]
    capsys.readouterr()
    out = generate("Hello there", stop=[mid], mute=False, **kw)[0]
    printed = capsys.readouterr().out
    assert mid not in printed
    assert out in printed


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
