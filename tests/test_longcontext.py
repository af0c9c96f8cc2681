"""Long-context paths: chunked prefill consistency and 4-bit-KV long decode.

The 128K story (SURVEY.md §5) is su-RoPE + cache quantization, not
parallelism: these tests exercise the same mechanisms at CPU-testable scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phi_3_vision_mlx_tpu.core.config import preset
from phi_3_vision_mlx_tpu.engine import engine as E
from phi_3_vision_mlx_tpu.models import phi3

CFG = preset("tiny")


@pytest.fixture(scope="module")
def params():
    return phi3.init_params(CFG, jax.random.PRNGKey(0))


def test_chunked_prefill_matches_single_shot(params, monkeypatch):
    """A prompt longer than PREFILL_CHUNK must produce the same last-token
    logits as a single forward pass."""
    monkeypatch.setattr(E, "PREFILL_CHUNK", 128)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 500, (1, 300)).astype(np.int32)
    lm = E.LM(CFG, params)
    logits, state, l_pad, window = E.run_prefill(lm, {"input_ids": ids}, 8)
    # reference: one pass over the identically padded prompt
    ids_p, pids_p, valid_p = E.pad_prompt_inputs({"input_ids": ids}, l_pad)
    ref = phi3.forward_nocache(
        params, CFG, jnp.asarray(ids_p), pids=jnp.asarray(pids_p),
        prompt_valid=jnp.asarray(valid_p),
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(logits)),
        np.asarray(ref[:, -1], np.float32),
        rtol=3e-4, atol=3e-4,
    )
    assert int(state.offset) == l_pad


def test_long_decode_with_quantized_cache(params):
    """Decode against a long (2K) window with the int4 group-32 cache: the
    su-RoPE long_factor regime engages (window > original_max_pos=128)."""
    cfg_q = CFG.replace(use_quantized_cache=True)
    ids = jnp.asarray(np.random.default_rng(1).integers(2, 500, (1, 64)))
    res = phi3.prefill(params, cfg_q, ids, max_tokens=2048 - 64)
    state = res.state
    assert state.window == 2048
    assert state.kv.k.dtype == jnp.uint8
    tok = jnp.argmax(res.logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    for _ in range(3):
        res = phi3.decode_forward(params, cfg_q, state, input_ids=tok)
        state = res.state
        tok = jnp.argmax(res.logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    assert int(state.offset) == 64 + 3
    assert np.isfinite(np.asarray(res.logits, np.float32)).all()


def test_surope_long_factor_regime(params):
    """Window beyond original_max_position_embeddings selects long_factor
    (reference SuRoPE, phi.py:492)."""
    from phi_3_vision_mlx_tpu.ops.rope import su_rope_tables

    cos_s, _ = su_rope_tables(CFG, CFG.original_max_position_embeddings)
    cos_l, _ = su_rope_tables(CFG, CFG.original_max_position_embeddings + 8)
    # different su-factors and attention scaling -> tables differ
    l = CFG.original_max_position_embeddings
    assert not np.allclose(
        np.asarray(cos_s[:, : l // 2], np.float32),
        np.asarray(cos_l[:, : l // 2], np.float32),
    )
