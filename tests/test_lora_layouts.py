"""inject_lora over every quantized payload layout.

Regression: on TPU the decoder weights are converted to the Pallas
tiled-contiguous layout (core/weights.kernelize_params) BEFORE any runtime
LoRA injection (e.g. serving an adapter over an already-loaded int4 base).
inject_lora used to read the logical (K, N) straight off ``weight.shape``,
which is wrong for tiled (nl, K/bk, N/bn, bk, bn/2) and nibble-packed
(nl, K, N/2) payloads — lora_a came out (nl, K/bk, r) and the first decode
step died with a dot_general shape error.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from phi_3_vision_mlx_tpu.core.config import QuantConfig, preset
from phi_3_vision_mlx_tpu.core.weights import kernelize_params
from phi_3_vision_mlx_tpu.ops import quant as Q
from phi_3_vision_mlx_tpu.ops.linear import dense
from phi_3_vision_mlx_tpu.train.lora import inject_lora

KDIM, N, NL, RANK = 1024, 1024, 2, 4


def _mini_params(rng):
    ts = [
        Q.quantize(
            jnp.asarray(rng.standard_normal((KDIM, N)), jnp.float32) * 0.02,
            64, 4, mode="affine",
        )
        for _ in range(NL)
    ]
    node = {
        "weight": jnp.stack([t.q for t in ts]),
        "scales": jnp.stack([t.scales for t in ts]),
        "biases": jnp.stack([t.biases for t in ts]),
    }
    return {"model": {"layers": {"self_attn": {"qkv_proj": node}}}}


def test_inject_lora_over_tiled_layout(rng):
    cfg = preset("phi35_mini").replace(
        num_hidden_layers=NL, quantized=QuantConfig(group_size=64, bits=4)
    )
    flat = _mini_params(rng)
    tiled = kernelize_params(copy.deepcopy(flat), cfg)
    assert tiled["model"]["layers"]["self_attn"]["qkv_proj"]["weight"].ndim == 5

    key = jax.random.PRNGKey(1)
    pf, _ = inject_lora(flat, cfg, ["self_attn.qkv_proj"], NL, RANK, key)
    pt, _ = inject_lora(tiled, cfg, ["self_attn.qkv_proj"], NL, RANK, key)
    nf = pf["model"]["layers"]["self_attn"]["qkv_proj"]
    nt = pt["model"]["layers"]["self_attn"]["qkv_proj"]

    # logical (K, N) recovered from the tiled payload
    assert nf["lora_a"].shape == nt["lora_a"].shape == (NL, KDIM, RANK)
    assert nf["lora_b"].shape == nt["lora_b"].shape == (NL, RANK, N)
    np.testing.assert_array_equal(np.asarray(nf["lora_a"]), np.asarray(nt["lora_a"]))

    # same dense output through both layouts (layer-0 slice, nonzero lora_b,
    # M > 256 so both sides take the XLA path on CPU)
    b = jnp.asarray(rng.standard_normal((RANK, N)), jnp.float32) * 0.1
    sf = {k: v[0] for k, v in nf.items()} | {"lora_b": b}
    st = {k: v[0] for k, v in nt.items()} | {"lora_b": b}
    x = jnp.asarray(rng.standard_normal((300, KDIM)), jnp.float32).astype(jnp.bfloat16)
    yf, yt = dense(sf, x), dense(st, x)
    np.testing.assert_allclose(
        np.asarray(yf, np.float32), np.asarray(yt, np.float32), rtol=0.05, atol=0.05
    )


def test_inject_lora_over_packed_flat_layout(rng):
    """Nibble-packed flat payload (nl, K, N/2): N must come from scales."""
    cfg = preset("phi35_mini").replace(
        num_hidden_layers=NL, quantized=QuantConfig(group_size=64, bits=4)
    )
    flat = _mini_params(rng)
    node = flat["model"]["layers"]["self_attn"]["qkv_proj"]
    q = np.asarray(node["weight"])
    node["weight"] = jnp.asarray(q[..., 0::2] | (q[..., 1::2] << 4))
    p, _ = inject_lora(flat, cfg, ["self_attn.qkv_proj"], NL, RANK, jax.random.PRNGKey(1))
    n = p["model"]["layers"]["self_attn"]["qkv_proj"]
    assert n["lora_a"].shape == (NL, KDIM, RANK)
    assert n["lora_b"].shape == (NL, RANK, N)
