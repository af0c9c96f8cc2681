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


@pytest.mark.slow
def test_prefill_ring_matches_prefill():
    """Sequence-parallel prefill (phi3.prefill_ring) must reproduce the
    single-device prefill — logits AND the written cache (verified by
    continuing the decode from both states)."""
    from phi_3_vision_mlx_tpu.core.config import preset
    from phi_3_vision_mlx_tpu.models import phi3

    cfg = preset("tiny", dtype="float32")
    params = phi3.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (1, 32)).astype(np.int32))

    ref = phi3.prefill(params, cfg, ids, max_tokens=8)
    mesh = make_mesh(data=4, model=1)
    out = phi3.prefill_ring(params, cfg, ids, mesh, max_tokens=8)
    np.testing.assert_allclose(
        np.asarray(out.logits, np.float32),
        np.asarray(ref.logits, np.float32),
        rtol=2e-4, atol=2e-4,
    )
    # continue decoding from both states: tokens must agree
    tok = jnp.argmax(out.logits[:, -1:], axis=-1).astype(jnp.int32)
    sr, so = ref.state, out.state
    for _ in range(4):
        r1 = phi3.decode_forward(params, cfg, sr, input_ids=tok)
        r2 = phi3.decode_forward(params, cfg, so, input_ids=tok)
        np.testing.assert_allclose(
            np.asarray(r2.logits, np.float32), np.asarray(r1.logits, np.float32),
            rtol=2e-4, atol=2e-4,
        )
        sr, so = r1.state, r2.state
        tok = jnp.argmax(r1.logits[:, -1:], axis=-1).astype(jnp.int32)


def test_engine_uses_ring_prefill():
    """LM(sp_mesh=...) routes text prefill through the ring path and decode
    continues normally (generate end-to-end on a CPU mesh)."""
    from phi_3_vision_mlx_tpu.core.config import preset
    from phi_3_vision_mlx_tpu.engine.engine import LM, generate_text
    from phi_3_vision_mlx_tpu.models import phi3
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3Processor
    from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer

    cfg = preset("tiny", vocab_size=32064, dtype="float32")
    params = phi3.init_params(cfg, jax.random.PRNGKey(1))
    proc = Phi3Processor(tokenizer=ByteTokenizer())
    plain = LM(cfg, params)
    ring = LM(cfg, params, sp_mesh=make_mesh(data=4, model=1))
    prompt = "Tell me about lighthouses and their keepers."
    out_plain = generate_text(plain, proc, prompt, max_tokens=6, verbose=False,
                              stream=False, mute=True)
    out_ring = generate_text(ring, proc, prompt, max_tokens=6, verbose=False,
                             stream=False, mute=True)
    assert ("prefill_ring", 1, 64, 128) in ring._fns or any(
        k[0] == "prefill_ring" for k in ring._fns
    )
    assert out_plain == out_ring
