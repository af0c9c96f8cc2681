"""Simulated multi-chip mesh: sharded execution must reproduce single-device
results exactly (SURVEY.md §7 stage-8 gate), and the driver dryrun passes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phi_3_vision_mlx_tpu.core.config import preset
from phi_3_vision_mlx_tpu.models import phi3
from phi_3_vision_mlx_tpu.parallel.mesh import make_mesh
from phi_3_vision_mlx_tpu.parallel.sharding import param_shardings, shard_params

CFG = preset(
    "tiny",
    hidden_size=256,
    intermediate_size=512,
    num_attention_heads=8,
    num_key_value_heads=8,
    vocab_size=4096,
)


@pytest.fixture(scope="module")
def params():
    return phi3.init_params(CFG, jax.random.PRNGKey(0))


def test_mesh_requires_devices():
    assert len(jax.devices()) >= 8


def test_sharded_prefill_matches_single(params):
    ids = jnp.asarray(np.random.default_rng(0).integers(2, 4000, (2, 16)))
    ref = phi3.prefill(params, CFG, ids, max_tokens=4).logits

    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(params, mesh)
    out = jax.jit(
        lambda p, i: phi3.prefill(p, CFG, i, max_tokens=4).logits
    )(sharded, ids)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-4, atol=5e-4
    )


def test_param_shardings_cover_tree(params):
    mesh = make_mesh(data=2, model=4)
    sh = param_shardings(params, mesh)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(
        sh, is_leaf=lambda x: hasattr(x, "spec")
    )
    assert len(flat_p) == len(flat_s)


@pytest.mark.parametrize("quantized", [False, True])
def test_state_shardings_match_state_structure(quantized):
    """state_shardings must have the exact pytree structure of a real
    DecodeState (the quantized cache fuses k+v payload and scale planes —
    engine/state.py init_state), else with_sharding_constraint throws."""
    from phi_3_vision_mlx_tpu.engine.state import init_state
    from phi_3_vision_mlx_tpu.parallel.sharding import state_shardings

    cfg = CFG.replace(use_quantized_cache=quantized)
    mesh = make_mesh(data=2, model=4)
    state = init_state(cfg, batch=2, prompt_len=8, l_all=16)
    shardings = state_shardings(cfg, mesh)
    assert jax.tree_util.tree_structure(state) == jax.tree_util.tree_structure(
        shardings, is_leaf=lambda x: hasattr(x, "spec")
    )
    constrained = jax.jit(
        lambda s: jax.lax.with_sharding_constraint(s, shardings)
    )(state)
    jax.block_until_ready(constrained)


@pytest.mark.slow
def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
