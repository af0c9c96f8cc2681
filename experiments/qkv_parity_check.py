import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from phi_3_vision_mlx_tpu.ops.kernels.kv_attention import (
    quantized_kv_attention, d_perm)

nl, b, kvh, h, d, G = 4, 1, 8, 8, 96, 3
lmax = 1024
key = jax.random.PRNGKey(3)
payload = jax.random.randint(key, (nl, b, kvh, d, lmax), 0, 256, jnp.int32).astype(jnp.uint8)
scales = (0.02 * jax.random.normal(key, (nl, b, kvh, 4 * G, lmax))).astype(jnp.bfloat16)
offset = 700
valid = (jnp.arange(lmax)[None, :] <= offset)
q = jax.random.normal(jax.random.PRNGKey(5), (b, h, 1, d), jnp.bfloat16)
scale = d ** -0.5

@jax.jit
def xla_ref(layer):
    pl_ = payload[layer, 0].astype(jnp.int32)  # (kvh, d, lmax)
    sc = scales[layer, 0].astype(jnp.float32)
    reps = d // G
    k4 = (pl_ & 15).astype(jnp.float32)
    v4 = (pl_ >> 4).astype(jnp.float32)
    def rep(x):  # tile-repeat rows G -> d (row r -> group r % G)
        return jnp.tile(x, (1, reps, 1))
    k = (k4 * rep(sc[:, :G]) + rep(sc[:, G:2*G]))
    v = (v4 * rep(sc[:, 2*G:3*G]) + rep(sc[:, 3*G:]))
    s = jnp.einsum('bhqd,hdk->bhqk', q.astype(jnp.float32), k) * scale
    kp = jnp.arange(lmax)[None, None, None, :]
    ok = (kp <= offset) & valid[None, None]
    s = jnp.where(ok, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum('bhqk,hdk->bhqd', p, v)

errs = []
for layer in range(nl):
    out = quantized_kv_attention(q, payload, scales, valid, offset, layer, scale=scale)
    ref = xla_ref(layer)
    errs.append(float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))))
print("max errs per layer:", [f"{e:.2e}" for e in errs])
assert max(errs) < 2e-2, errs
print("PARITY OK")
