"""Ring attention over a simulated mesh == single-device causal attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phi_3_vision_mlx_tpu.ops.attention import masked_attention
from phi_3_vision_mlx_tpu.parallel.mesh import make_mesh
from phi_3_vision_mlx_tpu.parallel.ring_attention import make_ring_attention


@pytest.mark.parametrize("kvh", [8, 4])
def test_ring_matches_dense(kvh):
    b, h, l, d = 2, 8, 64, 32
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, l, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, kvh, l, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, kvh, l, d), jnp.float32)
    valid = jnp.ones((b, l), bool).at[:, :5].set(False)

    pos = jnp.arange(l)
    allowed = (pos[None, :] <= pos[:, None])[None, None] & valid[:, None, None, :]
    ref = masked_attention(q, k, v, allowed, d**-0.5)

    mesh = make_mesh(data=4, model=1)
    ring = make_ring_attention(mesh, seq_axis="data")
    out = ring(q, k, v, valid)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
