"""The 128K-context path, executed: KV heads sharded over a mesh.

One Phi-3-mini-sized chip cannot hold the 128K quantized cache (~16 GB;
ROADMAP).  The production answer is tensor-parallel KV head sharding
(parallel/sharding.py): each of 8 devices holds 1/8 of the heads, i.e.
~2 GB of cache.  This test runs that configuration for real on the 8-device
CPU mesh — full 131072-position window, true head count (32), real decode
steps — with the layer count cut to 2 so host memory stays bounded (the
cache is the quantity being sharded; layers only multiply it linearly).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from phi_3_vision_mlx_tpu.core.config import preset
from phi_3_vision_mlx_tpu.models import phi3
from phi_3_vision_mlx_tpu.parallel.mesh import make_mesh
from phi_3_vision_mlx_tpu.parallel.sharding import shard_params, state_shardings


@pytest.mark.slow
def test_128k_window_decode_with_sharded_kv_heads():
    cfg = preset(
        "phi35_mini",
        num_hidden_layers=2,
        hidden_size=512,
        intermediate_size=1024,
        num_attention_heads=32,   # real head count: the sharded dimension
        num_key_value_heads=32,
        vocab_size=1024,
        use_quantized_cache=True,
    )
    window = 131072
    mesh = make_mesh(data=1, model=8)
    params = shard_params(phi3.init_params(cfg, jax.random.PRNGKey(0)), mesh)
    st_shard = state_shardings(cfg, mesh)

    @jax.jit
    def prefill_fn(params, ids):
        res = phi3.prefill(params, cfg, ids, max_tokens=window - ids.shape[1])
        state = jax.lax.with_sharding_constraint(res.state, st_shard)
        return res.logits[:, -1, :], state

    @jax.jit
    def step_fn(params, tok, state):
        res = phi3.decode_forward(params, cfg, state, input_ids=tok)
        return res.logits[:, -1, :], res.state

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 1000, (1, 64)).astype(np.int32))
    logits, state = prefill_fn(params, ids)
    assert state.window == window
    # the per-device cache shard is 1/8 of the heads
    shard_shape = state.kv.k.sharding.shard_shape(state.kv.k.shape)
    assert shard_shape[2] == cfg.num_key_value_heads // 8
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
    for _ in range(2):
        logits, state = step_fn(params, tok, state)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
    assert np.isfinite(np.asarray(logits, np.float32)).all()
    assert int(state.offset) == 64 + 2
