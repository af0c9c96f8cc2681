"""Pallas quant-matmul kernels vs the XLA fallback (interpret mode on CPU).

Covers the tiled-contiguous layout (v2) in affine and symmetric modes,
unstacked and stacked, plus layout round-trips and the quantization-error
cost of symmetric mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phi_3_vision_mlx_tpu.ops import quant as Q
from phi_3_vision_mlx_tpu.ops.kernels import quant_matmul as K

KDIM, N = 1024, 1024
GROUP = 64


def _random_qtensor(rng, mode, k=KDIM, n=N):
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32) * 0.02
    return Q.quantize(w, GROUP, 4, mode=mode)


@pytest.mark.parametrize("mode", ["affine", "symmetric"])
def test_tiled_layout_roundtrip(rng, mode):
    t = _random_qtensor(rng, mode)
    q_tiles, s_tiles, b_tiles = K.to_tiled_layout(t.q, t.scales, t.biases)
    assert q_tiles.shape == (KDIM // K.BLOCK_K, N // K.PACK_BLOCK_N, K.BLOCK_K, 256)
    q2, s2, b2 = K.from_tiled_layout(q_tiles, s_tiles, b_tiles)
    np.testing.assert_array_equal(np.asarray(q2), np.asarray(t.q))
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(t.scales.astype(jnp.bfloat16), dtype=np.float32),
        rtol=1e-2,
    )
    assert (b2 is None) == (mode == "symmetric")


@pytest.mark.parametrize("mode", ["affine", "symmetric"])
def test_tiled_kernel_matches_xla(rng, mode):
    t = _random_qtensor(rng, mode)
    x = jnp.asarray(rng.standard_normal((3, KDIM)), jnp.float32).astype(jnp.bfloat16)
    ref = Q.quantized_matmul(
        x,
        Q.QTensor(
            t.q,
            t.scales.astype(jnp.bfloat16).astype(jnp.float32),
            None if t.biases is None else t.biases.astype(jnp.bfloat16).astype(jnp.float32),
        ),
    )
    q_tiles, s_tiles, b_tiles = K.to_tiled_layout(t.q, t.scales, t.biases)
    xp = K.permute_activation(x, GROUP)
    out = K.quant_matmul_tiled(
        xp, q_tiles, s_tiles, b_tiles, out_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref, dtype=np.float32), rtol=0.05, atol=0.05
    )


@pytest.mark.parametrize("mode", ["affine", "symmetric"])
def test_tiled_stacked_kernel_selects_layer(rng, mode):
    nl = 3
    ts = [_random_qtensor(rng, mode, k=512, n=512) for _ in range(nl)]
    tiled = [K.to_tiled_layout(t.q, t.scales, t.biases) for t in ts]
    q_st = jnp.stack([tt[0] for tt in tiled])
    s_st = jnp.stack([tt[1] for tt in tiled])
    b_st = None if mode == "symmetric" else jnp.stack([tt[2] for tt in tiled])
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32).astype(jnp.bfloat16)
    xp = K.permute_activation(x, GROUP)
    for li in range(nl):
        out = K.quant_matmul_tiled_stacked(
            xp, q_st, s_st, b_st, li, out_dtype=jnp.float32, interpret=True
        )
        ref = Q.quantized_matmul(
            x,
            Q.QTensor(
                ts[li].q,
                ts[li].scales.astype(jnp.bfloat16).astype(jnp.float32),
                None
                if ts[li].biases is None
                else ts[li].biases.astype(jnp.bfloat16).astype(jnp.float32),
            ),
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref, dtype=np.float32), rtol=0.05, atol=0.05
        )


def test_symmetric_error_cost_is_bounded(rng):
    """Symmetric drops the bias plane for ~6% less HBM traffic; document that
    its quantization error on Gaussian weights stays within 2x of affine."""
    w = jnp.asarray(rng.standard_normal((KDIM, N)), jnp.float32) * 0.02
    err = {}
    for mode in ("affine", "symmetric"):
        t = Q.quantize(w, GROUP, 4, mode=mode)
        back = Q.dequantize(t, dtype=jnp.float32)
        err[mode] = float(jnp.mean((back - w) ** 2))
    assert err["symmetric"] < 2.0 * err["affine"], err


def test_dense_dispatch_tiled_layout(rng):
    """ops.linear.dense on a tiled-layout leaf (decode and prefill regimes)."""
    from phi_3_vision_mlx_tpu.ops import linear as L

    t = _random_qtensor(rng, "symmetric")
    x_small = jnp.asarray(rng.standard_normal((2, KDIM)), jnp.float32).astype(jnp.bfloat16)
    x_big = jnp.asarray(rng.standard_normal((300, KDIM)), jnp.float32).astype(jnp.bfloat16)
    plain = {"weight": t.q, "scales": t.scales}
    q_tiles, s_tiles, _ = K.to_tiled_layout(t.q, t.scales, None)
    tiled = {"weight": q_tiles, "scales": s_tiles}
    # The large-M regime avoids the Pallas kernel entirely -> runs on CPU.
    ref_big = L.dense(plain, x_big)
    out_big = L.dense(tiled, x_big)
    np.testing.assert_allclose(
        np.asarray(out_big, dtype=np.float32),
        np.asarray(ref_big, dtype=np.float32),
        rtol=0.05,
        atol=0.05,
    )


def test_quantized_flash_matches_read_kv_window():
    """quantized_flash_attention (prefill-sized q blocks, in-kernel nibble
    dequant) vs dequantize-the-window (read_kv) + masked XLA attention."""
    from phi_3_vision_mlx_tpu.core.config import KVQuantConfig
    from phi_3_vision_mlx_tpu.engine.state import LayerKV, quantize_chunk, read_kv
    from phi_3_vision_mlx_tpu.ops.attention import masked_attention
    from phi_3_vision_mlx_tpu.ops.kernels.kv_attention import (
        d_perm,
        d_unperm,
        quantized_flash_attention,
    )

    rng = np.random.default_rng(2)
    nl, b, h, kvh, d, w = 2, 1, 4, 2, 32, 256
    lq, off = 40, 24  # 40-query chunk extending a 24-column cache
    kvq = KVQuantConfig()

    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k_raw = jnp.asarray(rng.standard_normal((nl, b, kvh, w, d)), jnp.float32)
    v_raw = jnp.asarray(rng.standard_normal((nl, b, kvh, w, d)), jnp.float32)
    entries = quantize_chunk(k_raw, v_raw, kvq, True)
    payload, scales = entries.k, entries.k_scales  # (nl,b,kvh,d,w), (nl,b,kvh,4G,w)

    valid = np.zeros((b, w), bool)
    valid[0, 4 : off + lq] = True  # 4 left-pad columns invisible
    valid = jnp.asarray(valid)
    groups = scales.shape[-2] // 4
    scale = d**-0.5

    for layer in range(nl):
        out_p = quantized_flash_attention(
            q[..., d_perm(d, groups)], payload, scales, valid,
            jnp.asarray(off, jnp.int32), jnp.asarray(layer, jnp.int32),
            scale=scale, block_q=16, block_k=128, interpret=True,
        )
        out = out_p[..., d_unperm(d, groups)]

        kc, vc = read_kv(
            LayerKV(k=payload[layer], k_scales=scales[layer]), jnp.float32, 4
        )
        q_pos = off + jnp.arange(lq)
        key_pos = jnp.arange(w)
        allowed = (key_pos[None, :] <= q_pos[:, None])[None, None] & valid[
            :, None, None, :
        ]
        ref = masked_attention(q, kc, vc, allowed, scale)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2, err_msg=f"layer {layer}",
        )


@pytest.mark.parametrize("lq", [1, 3])
def test_quantized_kv_attention_matches_read_kv(lq):
    """quantized_kv_attention (the production single-token/spec decode kernel,
    factored-bias dequant) vs dequantize-the-window (read_kv) + masked XLA
    attention — interpret mode, NONZERO bias planes (affine KV quant).

    This is the ADVICE-r4 gap: the factored-bias rewrite previously had no
    collected numerics coverage (only experiments/qkv_parity_check.py on a
    real chip)."""
    from phi_3_vision_mlx_tpu.core.config import KVQuantConfig
    from phi_3_vision_mlx_tpu.engine.state import LayerKV, quantize_chunk, read_kv
    from phi_3_vision_mlx_tpu.ops.attention import masked_attention
    from phi_3_vision_mlx_tpu.ops.kernels.kv_attention import (
        d_perm,
        d_unperm,
        quantized_kv_attention,
    )

    rng = np.random.default_rng(7)
    nl, b, h, kvh, d, w = 2, 2, 4, 2, 32, 256
    off = 100  # decode step at offset 100; columns beyond are invalid
    kvq = KVQuantConfig()

    # Shift k/v off zero-mean so the bias planes carry real signal: a
    # factored-bias bug cannot hide behind near-zero biases.
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k_raw = jnp.asarray(rng.standard_normal((nl, b, kvh, w, d)) + 0.7, jnp.float32)
    v_raw = jnp.asarray(rng.standard_normal((nl, b, kvh, w, d)) - 0.4, jnp.float32)
    entries = quantize_chunk(k_raw, v_raw, kvq, True)
    payload, scales = entries.k, entries.k_scales
    groups = scales.shape[-2] // 4
    kbias = scales[:, :, :, groups : 2 * groups]
    assert float(jnp.abs(kbias.astype(jnp.float32)).max()) > 0.1  # nonzero bias

    valid = np.zeros((b, w), bool)
    valid[:, 2 : off + lq] = True  # 2 left-pad columns invisible
    valid = jnp.asarray(valid)
    scale = d**-0.5

    for layer in range(nl):
        out_p = quantized_kv_attention(
            q[..., d_perm(d, groups)], payload, scales, valid,
            jnp.asarray(off, jnp.int32), jnp.asarray(layer, jnp.int32),
            scale=scale, interpret=True,
        )
        out = out_p[..., d_unperm(d, groups)]

        kc, vc = read_kv(
            LayerKV(k=payload[layer], k_scales=scales[layer]), jnp.float32, 4
        )
        q_pos = off + jnp.arange(lq)
        key_pos = jnp.arange(w)
        allowed = (key_pos[None, :] <= q_pos[:, None])[None, None] & valid[
            :, None, None, :
        ]
        ref = masked_attention(q, kc, vc, allowed, scale)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2, err_msg=f"layer {layer}",
        )


def test_quantized_flash_unaligned_lq():
    """lq not a multiple of the q block: trailing pad rows must not leak."""
    from phi_3_vision_mlx_tpu.core.config import KVQuantConfig
    from phi_3_vision_mlx_tpu.engine.state import LayerKV, quantize_chunk, read_kv
    from phi_3_vision_mlx_tpu.ops.attention import masked_attention
    from phi_3_vision_mlx_tpu.ops.kernels.kv_attention import (
        d_perm,
        d_unperm,
        quantized_flash_attention,
    )

    rng = np.random.default_rng(3)
    b, h, kvh, d, w = 1, 2, 2, 32, 128
    lq, off = 20, 0
    kvq = KVQuantConfig()
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k_raw = jnp.asarray(rng.standard_normal((1, b, kvh, w, d)), jnp.float32)
    v_raw = jnp.asarray(rng.standard_normal((1, b, kvh, w, d)), jnp.float32)
    entries = quantize_chunk(k_raw, v_raw, kvq, True)
    payload, scales = entries.k, entries.k_scales
    valid = jnp.asarray(np.arange(w)[None] < lq)
    groups = scales.shape[-2] // 4
    scale = d**-0.5

    out_p = quantized_flash_attention(
        q[..., d_perm(d, groups)], payload, scales, valid,
        jnp.asarray(off, jnp.int32), jnp.asarray(0, jnp.int32),
        scale=scale, block_q=8, block_k=128, interpret=True,
    )
    out = out_p[..., d_unperm(d, groups)]
    kc, vc = read_kv(LayerKV(k=payload[0], k_scales=scales[0]), jnp.float32, 4)
    q_pos = off + jnp.arange(lq)
    key_pos = jnp.arange(w)
    allowed = (key_pos[None, :] <= q_pos[:, None])[None, None] & valid[
        :, None, None, :
    ]
    ref = masked_attention(q, kc, vc, allowed, scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
