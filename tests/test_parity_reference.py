"""Token-exact fp32 parity vs an independent NumPy transcription of the
reference forward pass (tests/reference_numpy.py; spec /root/reference/phi.py
:418-617).  This is the offline stand-in for BASELINE.md's real-weight parity
gate: it catches op-order/numeric transcription bugs in suRoPE (both
regimes), Mask4D/left-pad semantics, the attention math, advance_offset
rewind, and the beam read path.  The vision scatter is covered separately in
tests/test_vision.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import reference_numpy as ref

from phi_3_vision_mlx_tpu.core.config import preset
from phi_3_vision_mlx_tpu.models import phi3

CFG = preset(
    "tiny",
    num_key_value_heads=4,  # the reference's manual attention has no GQA path
    dtype="float32",
)


def _cfg_dict(cfg):
    return {
        "hidden_size": cfg.hidden_size,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "num_hidden_layers": cfg.num_hidden_layers,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "original_max_position_embeddings": cfg.original_max_position_embeddings,
        "rope_long_factor": list(cfg.rope_scaling.long_factor),
        "rope_short_factor": list(cfg.rope_scaling.short_factor),
    }


def _ref_weights(params, cfg):
    """Our pytree (stacked layers, (in,out) linears) -> fixture dict
    ((out,in) linears, per-layer list)."""
    mdl = params["model"]
    lay = mdl["layers"]
    f32 = lambda a: np.asarray(a, np.float32)
    layers = []
    for i in range(cfg.num_hidden_layers):
        layers.append(
            {
                "qkv_w": f32(lay["self_attn"]["qkv_proj"]["weight"][i]).T,
                "o_w": f32(lay["self_attn"]["o_proj"]["weight"][i]).T,
                "gate_up_w": f32(lay["mlp"]["gate_up_proj"]["weight"][i]).T,
                "down_w": f32(lay["mlp"]["down_proj"]["weight"][i]).T,
                "ln1_w": f32(lay["input_layernorm"]["weight"][i]),
                "ln2_w": f32(lay["post_attention_layernorm"]["weight"][i]),
            }
        )
    return {
        "embed": f32(mdl["embed_tokens"]["weight"]),
        "layers": layers,
        "norm_w": f32(mdl["norm"]["weight"]),
        "head_w": f32(params["lm_head"]["weight"]).T,
    }


@pytest.fixture(scope="module")
def setup():
    params = phi3.init_params(CFG, jax.random.PRNGKey(0))
    return params, _ref_weights(params, CFG), _cfg_dict(CFG)


def _ours_greedy(params, ids, max_tokens, pids=None, valid=None):
    res = phi3.prefill(
        params, CFG, jnp.asarray(ids), max_tokens=max_tokens,
        pids=None if pids is None else jnp.asarray(pids),
        prompt_valid=None if valid is None else jnp.asarray(valid),
    )
    state = res.state
    logits = [np.asarray(res.logits[:, -1], np.float32)]
    toks = [np.argmax(logits[-1], axis=-1)]
    for _ in range(max_tokens - 1):
        res = phi3.decode_forward(
            params, CFG, state, input_ids=jnp.asarray(toks[-1][:, None], jnp.int32)
        )
        state = res.state
        logits.append(np.asarray(res.logits[:, -1], np.float32))
        toks.append(np.argmax(logits[-1], axis=-1))
    return np.stack(toks, axis=1), np.stack(logits, axis=1), state


def _ref_greedy(cfg_d, weights, ids, max_tokens, pids=None, mask=None):
    model = ref.RefModel(cfg_d, weights)
    logits = model(ids, max_tokens=max_tokens, pids=pids, mask=mask)
    toks = [np.argmax(logits[:, -1], axis=-1)]
    logs = [logits[:, -1]]
    for _ in range(max_tokens - 1):
        logits = model(toks[-1][:, None])
        toks.append(np.argmax(logits[:, -1], axis=-1))
        logs.append(logits[:, -1])
    return np.stack(toks, axis=1), np.stack(logs, axis=1), model


def test_greedy_short_rope_regime(setup):
    params, weights, cfg_d = setup
    rng = np.random.default_rng(0)
    ids = rng.integers(2, CFG.vocab_size, (1, 12)).astype(np.int32)
    ours_t, ours_l, _ = _ours_greedy(params, ids, 8)
    ref_t, ref_l, _ = _ref_greedy(cfg_d, weights, ids, 8)
    np.testing.assert_allclose(ours_l, ref_l, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(ours_t, ref_t)


def test_greedy_long_rope_regime(setup):
    """L_all > original_max_position_embeddings selects long_factor + both
    sides must agree bit-for-bit on the regime switch."""
    params, weights, cfg_d = setup
    rng = np.random.default_rng(1)
    ids = rng.integers(2, CFG.vocab_size, (1, 124)).astype(np.int32)
    ours_t, ours_l, _ = _ours_greedy(params, ids, 6)  # L_all = 130 > 128
    ref_t, ref_l, _ = _ref_greedy(cfg_d, weights, ids, 6)
    np.testing.assert_allclose(ours_l, ref_l, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(ours_t, ref_t)


def test_left_padded_batch_pids_mask(setup):
    """Left-padding semantics: pad pids = 1, pad mask = 0 (reference
    Phi3FProcessor, phi.py:233-245)."""
    params, weights, cfg_d = setup
    rng = np.random.default_rng(2)
    b, l = 2, 10
    ids = rng.integers(2, CFG.vocab_size, (b, l)).astype(np.int32)
    pad = np.array([3, 0])
    pids = np.stack(
        [
            np.concatenate([np.ones(p, np.int32), np.arange(l - p, dtype=np.int32)])
            for p in pad
        ]
    )
    mask = np.stack(
        [
            np.concatenate([np.zeros(p, np.int32), np.ones(l - p, np.int32)])
            for p in pad
        ]
    )
    ids = ids * mask  # pad ids -> 0, like the processor
    ours_t, ours_l, _ = _ours_greedy(params, ids, 6, pids=pids, valid=mask.astype(bool))
    ref_t, ref_l, _ = _ref_greedy(cfg_d, weights, ids, 6, pids=pids, mask=mask)
    np.testing.assert_allclose(ours_l, ref_l, rtol=2e-4, atol=3e-4)
    np.testing.assert_array_equal(ours_t, ref_t)


def test_advance_offset_rewind(setup):
    """Scoring a forced suffix with advance_offset=0 must not disturb the
    cache (reference phi_3_vision_mlx.py:545); committing exactly 1 token of
    an L-token chunk (advance_offset=1, :570) must match."""
    params, weights, cfg_d = setup
    rng = np.random.default_rng(3)
    ids = rng.integers(2, CFG.vocab_size, (1, 8)).astype(np.int32)
    suffix = rng.integers(2, CFG.vocab_size, (1, 4)).astype(np.int32)

    # ours
    res = phi3.prefill(params, CFG, jnp.asarray(ids), max_tokens=10)
    state = res.state
    score = phi3.decode_forward(
        params, CFG, state, input_ids=jnp.asarray(suffix), advance=0
    )
    ours_score = np.asarray(score.logits, np.float32)
    # the rewound state must continue exactly as if the scoring never happened
    cont = phi3.decode_forward(
        params, CFG, score.state,
        input_ids=jnp.asarray(
            np.argmax(np.asarray(res.logits[:, -1]), -1)[:, None].astype(np.int32)
        ),
    )
    ours_cont = np.asarray(cont.logits[:, -1], np.float32)

    # reference
    model = ref.RefModel(cfg_d, weights)
    ref_prefill = model(ids, max_tokens=10)
    ref_score = model(suffix, advance_offset=0)
    ref_cont = model(np.argmax(ref_prefill[:, -1:], -1))
    np.testing.assert_allclose(ours_score, ref_score, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours_cont, ref_cont[:, -1], rtol=2e-4, atol=2e-4)

    # advance_offset=1: commit exactly one token of the chunk
    res2 = phi3.prefill(params, CFG, jnp.asarray(ids), max_tokens=10)
    step = phi3.decode_forward(
        params, CFG, res2.state, input_ids=jnp.asarray(suffix), advance=1
    )
    model2 = ref.RefModel(cfg_d, weights)
    model2(ids, max_tokens=10)
    ref_step = model2(suffix, advance_offset=1)
    assert int(step.state.offset) == model2.offset
    np.testing.assert_allclose(
        np.asarray(step.logits, np.float32), ref_step, rtol=2e-4, atol=2e-4
    )


def test_beam_read_path(setup):
    """n_beam>1 scores a (B*n, L) chunk against the shared cache without
    committing (reference KVCache beam mode, phi.py:523-527)."""
    params, weights, cfg_d = setup
    rng = np.random.default_rng(4)
    ids = rng.integers(2, CFG.vocab_size, (1, 8)).astype(np.int32)
    beams = rng.integers(2, CFG.vocab_size, (3, 5)).astype(np.int32)

    res = phi3.prefill(params, CFG, jnp.asarray(ids), max_tokens=10)
    ours = phi3.decode_forward(
        params, CFG, res.state, input_ids=jnp.asarray(beams), n_beam=3
    )
    model = ref.RefModel(cfg_d, weights)
    model(ids, max_tokens=10)
    ref_logits = model(beams, n_beam=3)
    np.testing.assert_allclose(
        np.asarray(ours.logits, np.float32), ref_logits, rtol=2e-4, atol=2e-4
    )
