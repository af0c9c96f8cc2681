"""Byte-level RetNet x Phi hybrid (stretch model family).

Behavioral spec: the reference's experimental ``assets/retnphi.py`` — a
tokenizer-free byte-vocab Phi variant whose attention is replaced by
multi-scale-decay *retention* (/root/reference/assets/retnphi.py:56-74 byte
vocab, :156-221 retention with parallel-train / recurrent-infer duality).

This is an original TPU-first implementation, not a port: retention is the
ideal decode primitive for TPU serving because the recurrent form carries an
O(heads * d^2) state instead of an O(L) KV cache — no cache window, no
attention kernel, every step is three small matmuls that live on the MXU.

Math (Retentive Network, Sun et al. 2023). Per head with decay ``g``:

    parallel:   Y_n = sum_{m<=n} g^(n-m) (q_n . k_m) v_m
    recurrent:  S_n = g S_{n-1} + k_n^T v_n ;  Y_n = q_n S_n

with q/k rotated by per-position xPos-style rotations (same rotate-half
construction as RoPE; ``ops.rope``).  Both forms are the *same function* —
``tests/test_retnet.py`` asserts this numerically — so you train with the
O(L^2) parallel form (big MXU matmuls) and serve with the O(1)-state
recurrent form.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BOS = 256
VOCAB = 258  # 256 bytes + BOS + one spare (EOS)


@dataclasses.dataclass(frozen=True)
class RetNetConfig:
    hidden_size: int = 256
    intermediate_size: int = 512
    num_hidden_layers: int = 4
    num_heads: int = 4
    vocab_size: int = VOCAB

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# ---------------------------------------------------------------------------
# Byte tokenizer (reference retnphi.py:56-74 uses raw UTF-8 bytes + specials)
# ---------------------------------------------------------------------------


def encode_bytes(s: str, add_bos: bool = True) -> list[int]:
    ids = list(s.encode("utf-8"))
    return ([BOS] + ids) if add_bos else ids


def decode_bytes(ids) -> str:
    return bytes(int(i) for i in np.asarray(ids).reshape(-1) if int(i) < 256).decode(
        "utf-8", errors="replace"
    )


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _dense(key, d_in, d_out, scale=None):
    scale = scale if scale is not None else d_in**-0.5
    return jax.random.normal(key, (d_in, d_out), jnp.float32) * scale


def init_params(cfg: RetNetConfig, key) -> dict:
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    d, f = cfg.hidden_size, cfg.intermediate_size

    def layer(k):
        kq, kk, kv, kg, ko, k1, k2 = jax.random.split(k, 7)
        return {
            "wq": _dense(kq, d, d),
            "wk": _dense(kk, d, d),
            "wv": _dense(kv, d, d),
            "wg": _dense(kg, d, d),
            "wo": _dense(ko, d, d),
            "w_gate_up": _dense(k1, d, 2 * f),
            "w_down": _dense(k2, f, d),
            "norm_ret": jnp.ones((d,), jnp.float32),
            "norm_mlp": jnp.ones((d,), jnp.float32),
        }

    return {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, d), jnp.float32) * 0.02,
        "layers": [layer(k) for k in keys[1:-1]],
        "norm_f": jnp.ones((d,), jnp.float32),
        "lm_head": _dense(keys[-1], d, cfg.vocab_size),
    }


# ---------------------------------------------------------------------------
# Retention core
# ---------------------------------------------------------------------------


def _decays(cfg: RetNetConfig) -> jax.Array:
    """Multi-scale per-head decay: g_h = 1 - 2^(-5-h) (retnphi.py:170)."""
    h = jnp.arange(cfg.num_heads, dtype=jnp.float32)
    return 1.0 - jnp.exp2(-5.0 - h)


def _rotate(x, pos):
    """xPos-style rotation at absolute positions ``pos`` (B|1, T)."""
    d = x.shape[-1]
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = pos[..., None].astype(jnp.float32) * freqs  # (B, T, d/2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    cos = cos[:, None]  # (B, 1, T, d/2) to broadcast over heads
    sin = sin[:, None]
    x1, x2 = x[..., ::2], x[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(x.shape)


def _heads(x, n):
    b, t, d = x.shape
    return x.reshape(b, t, n, d // n).transpose(0, 2, 1, 3)


def _unheads(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _head_norm(y):
    """Per-position, per-head RMS normalization (applied identically in both
    forms, so the parallel/recurrent duality is preserved)."""
    return y * jax.lax.rsqrt(jnp.mean(jnp.square(y), axis=-1, keepdims=True) + 1e-6)


def _rms(x, w):
    return w * x * jax.lax.rsqrt(jnp.mean(jnp.square(x), -1, keepdims=True) + 1e-6)


def _qkvg(p, x, cfg, pos):
    q = _rotate(_heads(x @ p["wq"], cfg.num_heads), pos)
    k = _rotate(_heads(x @ p["wk"], cfg.num_heads), pos) * (cfg.head_dim**-0.5)
    v = _heads(x @ p["wv"], cfg.num_heads)
    gate = jax.nn.swish(x @ p["wg"])
    return q, k, v, gate


def _retention_parallel(q, k, v, decays):
    """(B, H, T, Dh) x3 -> (B, H, T, Dh) via the O(T^2) decay-masked form."""
    t = q.shape[2]
    n = jnp.arange(t, dtype=jnp.float32)
    delta = n[:, None] - n[None, :]  # n - m
    # D[h, n, m] = g_h^(n-m) for n >= m else 0, computed in log space.
    logd = jnp.log(decays)[:, None, None] * delta
    dmask = jnp.where(delta >= 0, jnp.exp(logd), 0.0)
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) * dmask
    return jnp.einsum("bhnm,bhmd->bhnd", scores, v)


class RetState(NamedTuple):
    """Recurrent carry: per-layer outer-product state + absolute position."""

    s: jax.Array  # (num_layers, B, H, Dh, Dh) float32
    pos: jax.Array  # () int32


def init_state(cfg: RetNetConfig, batch: int) -> RetState:
    return RetState(
        s=jnp.zeros(
            (cfg.num_hidden_layers, batch, cfg.num_heads, cfg.head_dim, cfg.head_dim),
            jnp.float32,
        ),
        pos=jnp.zeros((), jnp.int32),
    )


def _retention_chunk(q, k, v, s_prev, decays):
    """Chunkwise-recurrent form: within-chunk parallel + cross-chunk state.

    q/k/v: (B, H, T, Dh) at absolute rotations; s_prev: (B, H, Dh, Dh).
    Returns (y, s_new) with y identical to the parallel form run from step 0.
    """
    t = q.shape[2]
    inner = _retention_parallel(q, k, v, decays)
    i = jnp.arange(t, dtype=jnp.float32)
    g = decays[None, :, None, None]  # (1, H, 1, 1)
    # cross contribution: Y_i += q_i g^(i+1) S_prev
    cross_w = g ** (i[None, None, :, None] + 1.0)
    y = inner + jnp.einsum("bhtd,bhde->bhte", q * cross_w, s_prev)
    # state update: S = g^T S_prev + sum_i g^(T-1-i) k_i^T v_i
    kw = k * (g ** (t - 1.0 - i[None, None, :, None]))
    s_new = (decays[None, :, None, None] ** t) * s_prev + jnp.einsum(
        "bhtd,bhte->bhde", kw, v
    )
    return y, s_new


def _mlp(p, x):
    gate_up = x @ p["w_gate_up"]
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return (jax.nn.swish(gate) * up) @ p["w_down"]


def _block(p, x, y_ret, gate):
    """Shared post-retention path: head-norm, gate, project, MLP residual."""
    y = _unheads(_head_norm(y_ret)) * gate
    x = x + y @ p["wo"]
    return x + _mlp(p, _rms(x, p["norm_mlp"]))


def forward_parallel(params, cfg: RetNetConfig, ids) -> jax.Array:
    """Training/prefill form: (B, L) ids -> (B, L, V) logits, O(L^2)."""
    decays = _decays(cfg)
    x = params["embed"][ids]
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    for p in params["layers"]:
        h = _rms(x, p["norm_ret"])
        q, k, v, gate = _qkvg(p, h, cfg, pos)
        y = _retention_parallel(q, k, v, decays)
        x = _block(p, x, y, gate)
    return _rms(x, params["norm_f"]) @ params["lm_head"]


def forward_recurrent(params, cfg: RetNetConfig, ids, state: RetState):
    """Serving form: (B, T) chunk + state -> ((B, T, V) logits, new state)."""
    decays = _decays(cfg)
    x = params["embed"][ids]
    t = ids.shape[1]
    pos = jnp.broadcast_to(state.pos + jnp.arange(t), ids.shape)
    new_s = []
    for li, p in enumerate(params["layers"]):
        h = _rms(x, p["norm_ret"])
        q, k, v, gate = _qkvg(p, h, cfg, pos)
        y, s = _retention_chunk(q, k, v, state.s[li], decays)
        new_s.append(s)
        x = _block(p, x, y, gate)
    logits = _rms(x, params["norm_f"]) @ params["lm_head"]
    return logits, RetState(s=jnp.stack(new_s), pos=state.pos + t)


# ---------------------------------------------------------------------------
# Tiny byte-LM trainer + greedy generation (retnphi.py's standalone trainer)
# ---------------------------------------------------------------------------


def train_byte_lm(params, cfg: RetNetConfig, texts, steps=100, lr=1e-3):
    import optax

    rows = [encode_bytes(t) for t in texts]
    maxlen = max(len(r) for r in rows)
    ids = np.zeros((len(rows), maxlen), np.int32)
    mask = np.zeros((len(rows), maxlen - 1), np.float32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        mask[i, : len(r) - 1] = 1.0
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = forward_parallel(p, cfg, ids)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], ids[:, 1:]
            )
            return (ce * mask).sum() / mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for _ in range(steps):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    return params, losses


def generate_bytes(params, cfg: RetNetConfig, prompt: str, max_tokens=32) -> str:
    ids = jnp.asarray([encode_bytes(prompt)], jnp.int32)
    state = init_state(cfg, 1)
    step = jax.jit(lambda p, i, s: forward_recurrent(p, cfg, i, s))
    logits, state = step(params, ids, state)
    out = []
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    for _ in range(max_tokens):
        out.append(int(tok[0, 0]))
        if out[-1] >= 256:
            break
        logits, state = step(params, tok, state)
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    return decode_bytes(out)
