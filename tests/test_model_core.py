"""Core decoder semantics: cache vs no-cache consistency, left-padding,
advance_offset rewind, beam scoring, quantized cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phi_3_vision_mlx_tpu.core.config import preset
from phi_3_vision_mlx_tpu.engine.state import init_state
from phi_3_vision_mlx_tpu.models import phi3

CFG = preset("tiny")


@pytest.fixture(scope="module")
def params():
    return phi3.init_params(CFG, jax.random.PRNGKey(0))


def test_prefill_matches_nocache(params):
    ids = jnp.array([[3, 5, 7, 11, 13, 17]])
    logits_nc = phi3.forward_nocache(params, CFG, ids)
    res = phi3.prefill(params, CFG, ids, max_tokens=4)
    np.testing.assert_allclose(
        np.asarray(res.logits), np.asarray(logits_nc), rtol=2e-4, atol=2e-4
    )
    assert int(res.state.offset) == ids.shape[1]


def test_incremental_decode_matches_full(params):
    """Prefill + single-token steps must reproduce teacher-forced logits."""
    ids = np.array([[3, 5, 7, 11, 13, 17, 19, 23]])
    full = np.asarray(phi3.forward_nocache(params, CFG, jnp.asarray(ids)))
    res = phi3.prefill(params, CFG, jnp.asarray(ids[:, :4]), max_tokens=4)
    state = res.state
    step_logits = [np.asarray(res.logits)[:, -1]]
    for t in range(4, 8):
        res = phi3.decode_forward(params, CFG, state, input_ids=jnp.asarray(ids[:, t : t + 1]))
        state = res.state
        step_logits.append(np.asarray(res.logits)[:, -1])
    inc = np.stack(step_logits, axis=1)  # (B, 5, V)
    np.testing.assert_allclose(inc, full[:, 3:], rtol=2e-4, atol=2e-4)


def test_left_padded_batch_matches_unpadded(params):
    """Reference left-pad semantics (phi.py:233-245): pad id 0, pid 1 at pads,
    mask 0 at pads.  A padded row must produce the same last-token logits as
    the same prompt unpadded."""
    prompt = [3, 5, 7, 11]
    pad = 3
    ids_pad = jnp.array([[0] * pad + prompt])
    pids = jnp.array([[1] * pad + list(range(len(prompt)))])
    valid = jnp.array([[False] * pad + [True] * len(prompt)])
    res_pad = phi3.prefill(
        params, CFG, ids_pad, max_tokens=2, pids=pids, prompt_valid=valid
    )
    res = phi3.prefill(params, CFG, jnp.array([prompt]), max_tokens=2)
    np.testing.assert_allclose(
        np.asarray(res_pad.logits)[:, -1],
        np.asarray(res.logits)[:, -1],
        rtol=2e-4,
        atol=2e-4,
    )
    # And the first decode step must also agree (rope continuation via pids).
    tok = jnp.array([[42]])
    d_pad = phi3.decode_forward(params, CFG, res_pad.state, input_ids=tok)
    d = phi3.decode_forward(params, CFG, res.state, input_ids=tok)
    np.testing.assert_allclose(
        np.asarray(d_pad.logits)[:, -1],
        np.asarray(d.logits)[:, -1],
        rtol=2e-4,
        atol=2e-4,
    )


def test_advance_offset_rewind(params):
    """advance=0 scores a suffix without committing (reference
    phi_3_vision_mlx.py:545): a subsequent real step must be unaffected."""
    ids = jnp.array([[3, 5, 7, 11]])
    state0 = phi3.prefill(params, CFG, ids, max_tokens=8).state
    suffix = jnp.array([[19, 23, 29]])
    scored = phi3.decode_forward(params, CFG, state0, input_ids=suffix, advance=0)
    assert int(scored.state.offset) == int(state0.offset)
    # Now take a normal step from the rewound state and from a pristine state.
    tok = jnp.array([[42]])
    a = phi3.decode_forward(params, CFG, scored.state, input_ids=tok)
    b = phi3.decode_forward(params, CFG, state0, input_ids=tok)
    np.testing.assert_allclose(
        np.asarray(a.logits), np.asarray(b.logits), rtol=2e-4, atol=2e-4
    )


def test_advance_offset_one_commits_first_token(params):
    """advance=1 with a [token, constraint...] chunk commits only the token
    (reference phi_3_vision_mlx.py:569-570)."""
    ids = jnp.array([[3, 5, 7, 11]])
    state0 = phi3.prefill(params, CFG, ids, max_tokens=8).state
    chunk = jnp.array([[42, 19, 23]])
    res = phi3.decode_forward(params, CFG, state0, input_ids=chunk, advance=1)
    assert int(res.state.offset) == int(state0.offset) + 1
    # The committed prefix must equal a plain single-token step.
    plain = phi3.decode_forward(params, CFG, state0, input_ids=jnp.array([[42]]))
    nxt_a = phi3.decode_forward(params, CFG, res.state, input_ids=jnp.array([[99]]))
    nxt_b = phi3.decode_forward(params, CFG, plain.state, input_ids=jnp.array([[99]]))
    np.testing.assert_allclose(
        np.asarray(nxt_a.logits), np.asarray(nxt_b.logits), rtol=2e-4, atol=2e-4
    )


def test_beam_scoring_matches_repeated_cache(params):
    """n_beam=3 scoring must equal running each beam row against its own
    copy of the cache (reference phi.py:523-527)."""
    ids = jnp.array([[3, 5, 7, 11]])
    state = phi3.prefill(params, CFG, ids, max_tokens=8).state
    beams = jnp.array([[42, 19], [43, 19], [44, 19]])  # (B*n_beam, 2)
    res = phi3.decode_forward(params, CFG, state, input_ids=beams, n_beam=3)
    assert res.logits.shape[0] == 3
    for i in range(3):
        solo = phi3.decode_forward(
            params, CFG, state, input_ids=beams[i : i + 1], advance=0
        )
        np.testing.assert_allclose(
            np.asarray(res.logits)[i], np.asarray(solo.logits)[0], rtol=2e-4, atol=3e-4
        )


def test_quantized_cache_close_to_dense(params):
    from phi_3_vision_mlx_tpu.core.config import KVQuantConfig

    ids = jnp.array([[3, 5, 7, 11, 13, 17]])
    dense_res = phi3.prefill(params, CFG, ids, max_tokens=2)
    d = np.asarray(dense_res.logits)[:, -1]
    # int8 group-32: argmax-stable even on random tiny weights.
    cfg8 = CFG.replace(use_quantized_cache=True, kv_quant=KVQuantConfig(bits=8))
    q8 = np.asarray(phi3.prefill(params, cfg8, ids, max_tokens=2).logits)[:, -1]
    assert np.argmax(d) == np.argmax(q8)
    assert np.mean(np.abs(d - q8)) / (np.mean(np.abs(d)) + 1e-9) < 0.03  # incl. bf16 scale storage
    # int4 group-32 (reference parity mode, phi.py:532): bounded error.
    cfg4 = CFG.replace(use_quantized_cache=True)
    q4 = np.asarray(phi3.prefill(params, cfg4, ids, max_tokens=2).logits)[:, -1]
    assert np.mean(np.abs(d - q4)) / (np.mean(np.abs(d)) + 1e-9) < 0.25
