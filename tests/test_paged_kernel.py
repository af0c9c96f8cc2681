"""Paged decode-attention Pallas kernel vs the XLA gather path (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp

from phi_3_vision_mlx_tpu.ops.attention import masked_attention
from phi_3_vision_mlx_tpu.ops.kernels.kv_attention import paged_kv_attention


def test_paged_kernel_matches_gathered_window():
    rng = np.random.default_rng(0)
    s, h, kvh, d, pg, mp, pool = 3, 8, 4, 32, 16, 4, 10
    w = mp * pg

    q = jnp.asarray(rng.standard_normal((s, h, 1, d)), jnp.float32)
    pool_k = jnp.asarray(rng.standard_normal((pool, kvh, pg, d)), jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((pool, kvh, pg, d)), jnp.float32)

    # slot 0: 2.5 pages committed (offset 40, pads 0); slot 1: 1 page + pads;
    # slot 2: stale/unallocated tail (sentinel entries)
    page_tables = jnp.asarray(
        [[0, 1, 2, pool], [3, 4, pool, pool], [5, pool, pool, pool]], jnp.int32
    )
    offsets = jnp.asarray([40, 17, 9], jnp.int32)
    valid = np.zeros((s, w), bool)
    valid[0, :40] = True
    valid[1, 4:17] = True  # left-pad: first 4 invalid
    valid[2, :9] = True
    valid = jnp.asarray(valid)

    out = paged_kv_attention(
        q, pool_k, pool_v, page_tables, valid, offsets, scale=d**-0.5,
        interpret=True,
    )

    # reference: gather the logical windows, then masked XLA attention
    gpt = jnp.minimum(page_tables, pool - 1)
    kc = pool_k[gpt].transpose(0, 2, 1, 3, 4).reshape(s, kvh, w, d)
    vc = pool_v[gpt].transpose(0, 2, 1, 3, 4).reshape(s, kvh, w, d)
    key_pos = jnp.arange(w)
    allowed = (
        ((key_pos[None, :] < offsets[:, None]) & valid)
        | (key_pos[None, :] == offsets[:, None])
    )[:, None, None, :]
    ref = masked_attention(q, kc, vc, allowed, d**-0.5)

    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,  # kernel computes k/v in bf16
    )


def test_paged_quantized_kernel_matches_xla_path():
    """Nibble-packed quantized paged kernel vs gather + read_kv (interpret)."""
    from phi_3_vision_mlx_tpu.core.config import KVQuantConfig
    from phi_3_vision_mlx_tpu.engine.state import LayerKV, quantize_chunk, read_kv
    from phi_3_vision_mlx_tpu.ops.kernels.kv_attention import (
        d_perm,
        d_unperm,
        paged_quantized_kv_attention,
    )

    rng = np.random.default_rng(1)
    s, h, kvh, d, pg, mp, pool = 2, 8, 4, 32, 16, 3, 8
    w = mp * pg
    kvq = KVQuantConfig()

    q = jnp.asarray(rng.standard_normal((s, h, 1, d)), jnp.float32)
    # build a quantized pool by quantizing random k/v pages
    k_raw = jnp.asarray(rng.standard_normal((pool, kvh, pg, d)), jnp.float32)
    v_raw = jnp.asarray(rng.standard_normal((pool, kvh, pg, d)), jnp.float32)
    entries = quantize_chunk(k_raw, v_raw, kvq, True)  # payload (P,KV,d,pg)
    pool_payload, pool_scales = entries.k, entries.k_scales

    page_tables = jnp.asarray([[0, 1, pool], [2, pool, pool]], jnp.int32)
    offsets = jnp.asarray([25, 10], jnp.int32)
    valid = np.zeros((s, w), bool)
    valid[0, :25] = True
    valid[1, 2:10] = True
    valid = jnp.asarray(valid)

    groups = pool_scales.shape[2] // 4
    perm = d_perm(d, groups)
    out = paged_quantized_kv_attention(
        q[..., perm], pool_payload, pool_scales, page_tables, valid, offsets,
        scale=d**-0.5, interpret=True,
    )[..., d_unperm(d, groups)]

    # XLA reference: gather pages -> transposed window -> read_kv -> attention
    from phi_3_vision_mlx_tpu.ops.attention import masked_attention

    gpt = jnp.minimum(page_tables, pool - 1)
    kq = pool_payload[gpt].transpose(0, 2, 3, 1, 4).reshape(s, kvh, d, w)
    sq = pool_scales[gpt].transpose(0, 2, 3, 1, 4).reshape(s, kvh, 4 * groups, w)
    kc, vc = read_kv(LayerKV(k=kq, k_scales=sq), jnp.float32, kvq.bits)
    kp = jnp.arange(w)
    allowed = (
        ((kp[None, :] < offsets[:, None]) & valid)
        | (kp[None, :] == offsets[:, None])
    )[:, None, None, :]
    ref = masked_attention(q, kc, vc, allowed, d**-0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_paged_kernel_multi_query_fresh_region():
    """lq > 1 (speculative verify pass): query i at offset+i must see the
    committed window plus fresh columns [offset, offset+i] regardless of
    their (uncommitted) validity bits."""
    rng = np.random.default_rng(2)
    s, h, kvh, d, pg, mp, pool = 2, 8, 4, 32, 16, 4, 12
    w = mp * pg
    lq = 4

    q = jnp.asarray(rng.standard_normal((s, h, lq, d)), jnp.float32)
    pool_k = jnp.asarray(rng.standard_normal((pool, kvh, pg, d)), jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((pool, kvh, pg, d)), jnp.float32)
    page_tables = jnp.asarray(
        [[0, 1, 2, pool], [3, 4, pool, pool]], jnp.int32
    )
    offsets = jnp.asarray([30, 14], jnp.int32)  # fresh cols cross a page edge
    valid = np.zeros((s, w), bool)
    valid[0, :30] = True
    valid[1, 3:14] = True
    valid = jnp.asarray(valid)

    out = paged_kv_attention(
        q, pool_k, pool_v, page_tables, valid, offsets, scale=d**-0.5,
        interpret=True,
    )

    gpt = jnp.minimum(page_tables, pool - 1)
    kc = pool_k[gpt].transpose(0, 2, 1, 3, 4).reshape(s, kvh, w, d)
    vc = pool_v[gpt].transpose(0, 2, 1, 3, 4).reshape(s, kvh, w, d)
    key_pos = jnp.arange(w)
    qpos = offsets[:, None] + jnp.arange(lq)[None, :]  # (S, lq)
    allowed = (
        ((key_pos[None, None, :] < offsets[:, None, None]) & valid[:, None, :])
        | ((key_pos[None, None, :] >= offsets[:, None, None])
           & (key_pos[None, None, :] <= qpos[:, :, None]))
    )[:, None]  # (S, 1, lq, W)
    ref = masked_attention(q, kc, vc, allowed, d**-0.5)

    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
