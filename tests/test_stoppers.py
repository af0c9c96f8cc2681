"""Stop criteria + streamer unit semantics (reference phi_3_vision_mlx.py:45-117)."""

import numpy as np

from phi_3_vision_mlx_tpu.core.config import ID_EOS
from phi_3_vision_mlx_tpu.engine.stream import LogitStopper, Streamer, TokenStopper
from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer


def test_token_stopper_waits_for_all_rows():
    ts = TokenStopper(3)
    assert not ts.update(np.array([ID_EOS, 5, 7]))
    assert not ts.update(np.array([9, ID_EOS, 7]))
    assert ts.update(np.array([1, 2, ID_EOS]))


def test_token_stopper_ignores_non_eos():
    ts = TokenStopper(2)
    for _ in range(5):
        assert not ts.update(np.array([1, 2]))


def test_logit_stopper_disabled_without_early_stop():
    ls = LogitStopper(100, False)
    assert not ls.update(-0.1, -5.0, 1)


def test_logit_stopper_fires_when_eos_dominates():
    """After `early_stop` steps, if a new best-EOS arrives and the log-prob
    mass accrued since the previous best is below that EOS score, stop."""
    ls = LogitStopper(100, early_stop=3)
    # a strong EOS candidate sets the bar
    assert not ls.update(-0.01, -0.5, 1)
    # low-confidence continuation accrues log-prob mass below that bar
    for _ in range(4):
        assert not ls.update(-1.0, -10.0, 1)
    # the next better EOS fires: mass since last best (-4) < best EOS (-0.5)
    assert ls.update(-1.0, -0.4, 1)


def test_logit_stopper_batch_disables():
    ls = LogitStopper(100, early_stop=2)
    assert not ls.update(-0.1, -1.0, 2)
    assert ls.early_stop is False


def test_streamer_batch_truncates_at_eos():
    tok = ByteTokenizer()
    s = Streamer(tok, stream=False, mute=True)
    a = 1000 + ord("h")
    b = 1000 + ord("i")
    s(np.array([[a], [a]]))
    s(np.array([[ID_EOS], [b]]))
    s(np.array([[b], [ID_EOS]]))
    texts, n = s.end()
    assert texts[0] == "h<|end|>"
    assert texts[1] == "hi<|end|>"
    assert n == 6
