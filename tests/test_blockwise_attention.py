"""Blockwise (memory-efficient, differentiable) attention vs the dense path."""

import jax
import jax.numpy as jnp
import numpy as np

from phi_3_vision_mlx_tpu.ops.attention import (
    blockwise_attention,
    prefill_attention,
)


def _inputs(kvh=4, l=256):
    key = jax.random.PRNGKey(0)
    b, h, d = 2, 8, 32
    q = jax.random.normal(key, (b, h, l, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, kvh, l, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, kvh, l, d), jnp.float32)
    valid = jnp.ones((b, l), bool).at[0, :7].set(False)
    return q, k, v, valid, d**-0.5


def test_blockwise_matches_dense():
    q, k, v, valid, scale = _inputs()
    ref = prefill_attention(q, k, v, valid, scale)
    out = blockwise_attention(q, k, v, valid, scale, q_block=64, k_block=128)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_blockwise_is_differentiable():
    """The whole point: flash is forward-only, this one backprops (used by
    long-context training in forward_nocache)."""
    q, k, v, valid, scale = _inputs(l=128)

    def loss(q, k, v):
        return blockwise_attention(q, k, v, valid, scale, q_block=32, k_block=32).sum()

    def loss_ref(q, k, v):
        return prefill_attention(q, k, v, valid, scale).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )
