"""Byte-level RetNet hybrid: parallel/recurrent equivalence + training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phi_3_vision_mlx_tpu.models import retnet as R

CFG = R.RetNetConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2, num_heads=4)


@pytest.mark.slow
def test_parallel_matches_recurrent():
    """The defining property of retention: the O(L^2) parallel form and the
    O(1)-state recurrent form are the same function."""
    params = R.init_params(CFG, jax.random.PRNGKey(0))
    ids = np.array([[256, 72, 101, 108, 108, 111]])  # BOS + b"Hello"
    logits_par = R.forward_parallel(params, CFG, jnp.asarray(ids))
    state = R.init_state(CFG, 1)
    outs = []
    for t in range(ids.shape[1]):
        lg, state = R.forward_recurrent(params, CFG, jnp.asarray(ids[:, t : t + 1]), state)
        outs.append(np.asarray(lg)[:, -1])
    rec = np.stack(outs, axis=1)
    np.testing.assert_allclose(rec, np.asarray(logits_par), rtol=2e-4, atol=2e-4)


def test_byte_roundtrip():
    s = "héllo ⚡"
    assert R.decode_bytes(R.encode_bytes(s, add_bos=False)) == s


def test_training_reduces_loss_and_memorizes():
    params = R.init_params(CFG, jax.random.PRNGKey(1))
    texts = ["ababab", "ababab"]
    params, losses = R.train_byte_lm(params, CFG, texts, steps=60, lr=3e-3)
    assert losses[-1] < losses[0] * 0.5
    out = R.generate_bytes(params, CFG, "abab", max_tokens=4)
    assert "ab" in out or out.startswith("a") or out.startswith("b")
