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
def test_sharded_decode_token_parity():
    """KV-head-sharded decode must reproduce single-device decode (small
    window; the correctness gate behind the 128K sharding story — VERDICT r2
    item 3).  Teacher-forced: both runs consume the single-device greedy
    tokens, per-step logits must be allclose, and any argmax difference is
    allowed only at a genuine fp tie (random tiny-model logits have near-ties
    that flip under the psum reduction order)."""
    cfg = preset(
        "phi35_mini",
        num_hidden_layers=2,
        hidden_size=256,
        intermediate_size=512,
        num_attention_heads=8,
        num_key_value_heads=8,
        vocab_size=2048,
        use_quantized_cache=True,
        dtype="float32",  # the parity gate is fp32 (bf16 reduction-order
        # noise across shardings is ~1%, expected, and not what's under test)
    )
    window = 256
    params0 = phi3.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(2, 2000, (1, 64)).astype(np.int32))
    n_steps = 15

    def run(params, forced, mesh=None):
        """Returns per-step (1, V) fp32 logits; step t consumes forced[t]."""
        st_shard = state_shardings(cfg, mesh) if mesh is not None else None
        if mesh is not None:
            params = shard_params(params, mesh)

        @jax.jit
        def prefill_fn(params, ids):
            res = phi3.prefill(params, cfg, ids, max_tokens=window - ids.shape[1])
            st = res.state
            if st_shard is not None:
                st = jax.lax.with_sharding_constraint(st, st_shard)
            return res.logits[:, -1, :], st

        @jax.jit
        def step_fn(params, tok, state):
            res = phi3.decode_forward(params, cfg, state, input_ids=tok)
            return res.logits[:, -1, :], res.state

        logits, state = prefill_fn(params, ids)
        seq = [np.asarray(logits, np.float32)]
        for t in range(n_steps):
            tok = (
                jnp.asarray([[forced[t]]], jnp.int32)
                if forced is not None
                else jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            )
            logits, state = step_fn(params, tok, state)
            seq.append(np.asarray(logits, np.float32))
        return seq

    single = run(params0, None)
    forced = [int(np.argmax(lg[0])) for lg in single[:-1]]
    sharded = run(params0, forced, make_mesh(data=1, model=8))
    for t, (lg1, lg8) in enumerate(zip(single, sharded)):
        assert np.allclose(lg1, lg8, rtol=1e-4, atol=1e-5), f"step {t}"
        a1, a8 = int(np.argmax(lg1[0])), int(np.argmax(lg8[0]))
        if a1 != a8:  # only a true fp tie may flip the argmax
            top2 = np.sort(lg1[0])[-2:]
            assert top2[1] - top2[0] < 1e-4, f"step {t}: non-tie argmax flip"


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
