"""Independent NumPy transcription of the reference forward pass.

This is a *test fixture*, not framework code: a line-faithful fp32
re-derivation of the reference decoder semantics (/root/reference/phi.py:
SuRoPE :487-507, KVCache :509-548, Mask4D :550-563, Phi3Attention manual
attention :440-460, Phi3MLP :462-471, Phi3DecoderLayer :473-485, Phi3F
:565-592, lm_head :599-608) used by test_parity_reference.py to assert
token-exact greedy agreement with the production model.  It deliberately
shares no code with phi_3_vision_mlx_tpu — every op is written from the
reference's math so a transcription bug in either side fails the test.

Weights are plain dicts of (out, in)-layout float32 arrays (HF convention,
like the reference's nn.Linear), keyed:
  embed (V, E); layers: list of dicts with qkv_w, o_w, gate_up_w, down_w,
  ln1_w, ln2_w; norm_w (E,); head_w (V, E).
"""

from __future__ import annotations

import math

import numpy as np


def su_rope_tables(cfg, l_all: int, pids=None):
    """Reference SuRoPE.__init__ (phi.py:487-504), fp32 trig."""
    dim = cfg["hidden_size"] // cfg["num_attention_heads"]
    scaling_factor = math.sqrt(
        1
        + math.log(cfg["max_position_embeddings"] / cfg["original_max_position_embeddings"])
        / math.log(cfg["original_max_position_embeddings"])
    )
    su = (
        cfg["rope_long_factor"]
        if l_all > cfg["original_max_position_embeddings"]
        else cfg["rope_short_factor"]
    )
    if pids is None:
        position_ids = np.arange(l_all, dtype=np.float32)[None]
    else:
        pids = np.asarray(pids, np.float32)
        extended = pids[:, -1][:, None] + 1 + np.arange(
            l_all - pids.shape[1], dtype=np.float32
        )[None, :]
        position_ids = np.concatenate([pids, extended], axis=1)
    inv_freq = 1.0 / (
        np.asarray(su, np.float32)
        * cfg["rope_theta"] ** (np.arange(0, dim, 2, dtype=np.float32) / dim)
    )
    # (B, dim/2, 1) @ (B, 1, L) -> (B, dim/2, L) -> (B, L, dim/2)
    freqs = np.einsum("d,bl->bdl", inv_freq, position_ids).transpose(0, 2, 1)
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos = (np.cos(emb) * scaling_factor)[:, None]  # (B, 1, L, dim)
    sin = (np.sin(emb) * scaling_factor)[:, None]
    return cos.astype(np.float32), sin.astype(np.float32)


def rotate_half(x, cos, sin):
    """Reference _rotate_half (phi.py:418-423)."""
    mid = x.shape[-1] // 2
    x1, x2 = x[..., :mid], x[..., mid:]
    return x * cos + np.concatenate([-x2, x1], axis=-1) * sin


def build_mask_4d(l_all: int, mask=None):
    """Reference Mask4D.__init__ (phi.py:550-560)."""
    m = np.triu(np.full((l_all, l_all), -np.inf, np.float32), k=1)[None, None]
    if mask is not None:
        mask = np.asarray(mask, np.float32)
        pad_len = l_all - mask.shape[-1]
        mask = np.pad(mask, ((0, 0), (0, pad_len)), constant_values=1)
        mask = mask[:, None, :, None] * mask[:, None, None, :]  # outer product
        mask = np.where(mask == 1, 0.0, -np.inf).astype(np.float32)
        m = m + mask  # (1,1,L,L) + (B,1,L,L)
    return m


def rms_norm(x, w, eps):
    v = np.mean(np.square(x), axis=-1, keepdims=True)
    return (x / np.sqrt(v + eps)) * w


def silu(x):
    return x / (1.0 + np.exp(-x))


def softmax(x, axis=-1):
    """Fully-masked (all -inf) rows resolve to zero weights rather than NaN
    — left-padded batches have all-masked pad query rows, and the reference
    runtime keeps them finite (its batched decode works); the exact junk
    value never reaches valid rows (their key weights are masked)."""
    mx_ = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - np.where(np.isfinite(mx_), mx_, 0.0))
    s = np.sum(e, axis=axis, keepdims=True)
    return np.where(s == 0, 0.0, e) / np.where(s == 0, 1.0, s)


class RefModel:
    """Reference model with per-layer KVCache objects (greedy + scoring +
    beam), matching Phi3F's call protocol."""

    def __init__(self, cfg: dict, weights: dict):
        self.cfg = cfg
        self.w = weights
        self.caches = None  # list of [k_buf, v_buf] per layer
        self.offset = 0
        self.mask_4d = None
        self.cos = None
        self.sin = None

    def __call__(
        self, input_ids=None, *, max_tokens=0, pids=None, mask=None,
        advance_offset=None, n_beam=1, inputs_embeds=None,
    ):
        cfg, w = self.cfg, self.w
        h_, kv_ = cfg["num_attention_heads"], cfg["num_key_value_heads"]
        d = cfg["hidden_size"] // h_
        if inputs_embeds is None:
            x = w["embed"][np.asarray(input_ids)].astype(np.float32)
        else:
            x = np.asarray(inputs_embeds, np.float32)
        b, l, _ = x.shape

        if self.caches is None:
            l_all = l + max_tokens
            self.caches = [
                [np.zeros((b, kv_, l_all, d), np.float32) for _ in range(2)]
                for _ in range(cfg["num_hidden_layers"])
            ]
            self.mask_4d = build_mask_4d(l_all, mask)
            self.cos, self.sin = su_rope_tables(cfg, l_all, pids)

        past_l = self.offset
        msk = self.mask_4d[:, :, past_l : past_l + l, : past_l + l]
        cos = self.cos[:, :, past_l : past_l + l]
        sin = self.sin[:, :, past_l : past_l + l]
        if n_beam > 1:
            cos = np.repeat(cos, n_beam, axis=0)
            sin = np.repeat(sin, n_beam, axis=0)
            msk = np.repeat(msk, n_beam, axis=0)

        scale = d**-0.5
        for li, lw in enumerate(w["layers"]):
            hin = rms_norm(x, lw["ln1_w"], cfg["rms_norm_eps"])
            qkv = hin @ lw["qkv_w"].T
            q = qkv[..., : h_ * d].reshape(b, l, h_, d).transpose(0, 2, 1, 3)
            k = (
                qkv[..., h_ * d : (h_ + kv_) * d]
                .reshape(b, l, kv_, d)
                .transpose(0, 2, 1, 3)
            )
            v = qkv[..., (h_ + kv_) * d :].reshape(b, l, kv_, d).transpose(0, 2, 1, 3)
            q = rotate_half(q, cos, sin)
            k = rotate_half(k, cos, sin)

            kbuf, vbuf = self.caches[li]
            if n_beam > 1:
                # beam read path (phi.py:523-527): repeat committed cache,
                # concat fresh, cache untouched
                kc = np.concatenate(
                    [np.repeat(kbuf[:, :, :past_l], n_beam, axis=0), k], axis=2
                )
                vc = np.concatenate(
                    [np.repeat(vbuf[:, :, :past_l], n_beam, axis=0), v], axis=2
                )
            else:
                new_off = past_l + l
                kbuf[:, :, past_l:new_off] = k
                vbuf[:, :, past_l:new_off] = v
                kc = kbuf[:, :, :new_off]
                vc = vbuf[:, :, :new_off]

            wts = softmax((q * scale) @ kc.transpose(0, 1, 3, 2) + msk, axis=-1)
            o = (wts @ vc).transpose(0, 2, 1, 3).reshape(b, l, -1)
            x = x + o @ lw["o_w"].T
            hmid = rms_norm(x, lw["ln2_w"], cfg["rms_norm_eps"])
            gate_up = hmid @ lw["gate_up_w"].T
            gate, up = np.split(gate_up, 2, axis=-1)
            x = x + (silu(gate) * up) @ lw["down_w"].T

        if n_beam == 1:
            self.offset = past_l + (l if advance_offset is None else advance_offset)
        x = rms_norm(x, w["norm_w"], cfg["rms_norm_eps"])
        return x @ w["head_w"].T


def greedy_decode(cfg, weights, prompt_ids, max_tokens, pids=None, mask=None):
    """Reference _generate loop (phi_3_vision_mlx.py:376-398), greedy fp32."""
    model = RefModel(cfg, weights)
    logits = model(prompt_ids, max_tokens=max_tokens, pids=pids, mask=mask)
    token = np.argmax(logits[:, -1, :], axis=-1)
    out = [token]
    for _ in range(max_tokens - 1):
        logits = model(token[:, None])
        token = np.argmax(logits[:, -1, :], axis=-1)
        out.append(token)
    return np.stack(out, axis=1), model  # (B, max_tokens)


# ===========================================================================
# Vision tower transcription (reference phi.py:135-226 ClipModel and
# :374-416 Phi3ImageEmbedding) — independent of models/vision.py.
#
# Weight dict layout (HF/MLX (out, in) linears, OHWI conv):
#   patch_w (E, P, P, 3); class_emb (E,); pos_emb (num_positions, E);
#   pre_ln_w/b, layers: list of dicts with q_w/q_b/k_w/k_b/v_w/v_b/out_w/
#   out_b, ln1_w/b, ln2_w/b, fc1_w/b, fc2_w/b; glb_GN (1,1,4C);
#   sub_GN (1,1,1,4C); proj0_w/b, proj2_w/b.
# ===========================================================================


def layer_norm(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = np.mean(np.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def gelu_fast_approx(x):
    """MLX nn.gelu_fast_approx: x * sigmoid(1.702 x) (CLIP MLP, phi.py:154)."""
    return x / (1.0 + np.exp(-1.702 * x))


def gelu_exact(x):
    """MLX nn.GELU default: 0.5 x (1 + erf(x / sqrt 2)) (img_projection,
    phi.py:392; BERT FF, gte.py:49)."""
    from math import sqrt

    try:
        from scipy.special import erf  # noqa
    except ImportError:  # scipy-free: vectorized math.erf
        erf = np.vectorize(__import__("math").erf)
    return 0.5 * x * (1.0 + erf(x / sqrt(2.0)))


def clip_tower(vcfg: dict, w: dict, pixels_nchw):
    """Reference ClipModel.__call__ (phi.py:213-221): conv patch embed, CLS,
    positions, pre-LN, pre-norm blocks through the PENULTIMATE layer, drop
    CLS.  Input (N, 3, S, S) like the reference call site (phi.py:396, which
    transposes to NHWC before the conv)."""
    p, e = vcfg["patch_size"], vcfg["hidden_size"]
    heads = vcfg["num_attention_heads"]
    eps = vcfg["layer_norm_eps"]
    x = np.asarray(pixels_nchw, np.float32).transpose(0, 2, 3, 1)  # NHWC
    n, s = x.shape[0], x.shape[1]
    g = s // p
    # stride-p VALID conv == per-patch flatten (kh, kw, ci) @ kernel
    patches = (
        x.reshape(n, g, p, g, p, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, g * g, p * p * 3)
    )
    kernel = np.asarray(w["patch_w"], np.float32).reshape(e, -1)  # (E, P*P*3)
    x = patches @ kernel.T  # (N, g*g, E); mx.flatten(1, 2) ordering
    cls = np.broadcast_to(w["class_emb"], (n, 1, e))
    x = np.concatenate([cls, x], axis=1)
    x = x + w["pos_emb"][None]
    x = layer_norm(x, w["pre_ln_w"], w["pre_ln_b"], eps)
    d = e // heads
    for lw in w["layers"][:-1]:  # penultimate (phi.py:219-220)
        h = layer_norm(x, lw["ln1_w"], lw["ln1_b"], eps)
        q = (h @ lw["q_w"].T + lw["q_b"]).reshape(n, -1, heads, d).transpose(0, 2, 1, 3)
        k = (h @ lw["k_w"].T + lw["k_b"]).reshape(n, -1, heads, d).transpose(0, 2, 1, 3)
        v = (h @ lw["v_w"].T + lw["v_b"]).reshape(n, -1, heads, d).transpose(0, 2, 1, 3)
        s_ = softmax((q * d**-0.5) @ k.transpose(0, 1, 3, 2), axis=-1)
        o = (s_ @ v).transpose(0, 2, 1, 3).reshape(n, -1, e)
        x = x + o @ lw["out_w"].T + lw["out_b"]
        h = layer_norm(x, lw["ln2_w"], lw["ln2_b"], eps)
        h = gelu_fast_approx(h @ lw["fc1_w"].T + lw["fc1_b"]) @ lw["fc2_w"].T + lw["fc2_b"]
        x = x + h
    return x[:, 1:]  # drop CLS (phi.py:221)


def image_embedding(vcfg: dict, w: dict, txt_embeds, img_embeds, img_sizes,
                    positions):
    """Reference Phi3ImageEmbedding.__call__ (phi.py:393-416): CLIP tower over
    flattened crops, 2x2 patch pooling via reshape/transpose, sub_GN row
    separators, [sub, glb_GN, glb] concat, two-layer GELU projection, scatter
    into txt_embeds at placeholder positions.  All fp32; mutates and returns
    txt_embeds like the reference."""
    txt_embeds = np.array(txt_embeds, np.float32)
    img_embeds = np.asarray(img_embeds, np.float32)
    b = img_embeds.shape[0]
    img_sizes = (np.asarray(img_sizes) // 336).tolist()
    positions = np.asarray(positions).tolist()
    feats = clip_tower(vcfg, w, img_embeds.reshape(-1, *img_embeds.shape[2:]))
    feats = feats.reshape(b, -1, *feats.shape[1:])  # (B, crops, 576, C)
    c, hh = vcfg["image_dim_out"], int(feats.shape[2] ** 0.5)
    output_imgs, output_len = [], []
    for bi in range(b):
        h, wd = img_sizes[bi]
        nb = h * wd

        def reshape_concat(img, shape, tile_shape):
            x = img.reshape(shape).transpose(0, 1, 3, 2, 4, 5).reshape(tile_shape)
            sub = np.tile(w["sub_GN"], (1, tile_shape[1], 1, 1))
            return np.concatenate([x, sub], axis=2).reshape(1, -1, 4 * c)

        glb = reshape_concat(
            feats[bi, :1], (1, hh // 2, 2, hh // 2, 2, c),
            (1, hh // 2, hh // 2, 4 * c),
        )
        sub = reshape_concat(
            feats[bi, 1 : nb + 1], (nb, hh // 2, 2, hh // 2, 2, c),
            (1, h * 12, wd * 12, 4 * c),
        )
        x = np.concatenate([sub, w["glb_GN"], glb], axis=1)
        x = gelu_exact(x @ w["proj0_w"].T + w["proj0_b"])
        x = x @ w["proj2_w"].T + w["proj2_b"]
        output_imgs.append(x)
        output_len.append(int((h * wd + 1) * 144 + 1 + (h + 1) * 12))
    idx = 0
    for i, cnt in enumerate(output_len):
        row, col = positions[idx][0], positions[idx][1]
        txt_embeds[row, col : col + cnt] = output_imgs[i]
        idx += cnt
    return txt_embeds


# ===========================================================================
# GTE BERT encoder transcription (reference gte.py:20-143) — independent of
# models/gte.py.  Weight dict ((out, in) linears):
#   word_emb (V, D); pos_emb (P, D); ttype_emb (2, D); emb_ln_w/b;
#   layers: list of dicts with q_w/q_b/k_w/k_b/v_w/v_b/o_w/o_b, ln1_w/b,
#   ln2_w/b, ff1_w/b, ff2_w/b.
# ===========================================================================


def bert_encode(cfg: dict, w: dict, input_ids, token_type_ids, attention_mask):
    """Reference Bert.__call__ (gte.py:97-121): additive embeddings + LN,
    post-LN blocks (MLX MultiHeadAttention with bias, additive log-mask,
    exact GELU FF), returns the last hidden state."""
    eps = cfg["layer_norm_eps"]
    heads = cfg["num_attention_heads"]
    ids = np.asarray(input_ids)
    x = (
        w["word_emb"][ids]
        + w["pos_emb"][np.arange(ids.shape[1])][None]
        + w["ttype_emb"][np.asarray(token_type_ids)]
    ).astype(np.float32)
    x = layer_norm(x, w["emb_ln_w"], w["emb_ln_b"], eps)
    # mx.log(mask) -> 0 where visible, -inf where padded (gte.py:115-117)
    with np.errstate(divide="ignore"):
        bias = np.log(np.asarray(attention_mask, np.float32))[:, None, None, :]
    b, l, e = x.shape
    d = e // heads
    for lw in w["layers"]:
        q = (x @ lw["q_w"].T + lw["q_b"]).reshape(b, l, heads, d).transpose(0, 2, 1, 3)
        k = (x @ lw["k_w"].T + lw["k_b"]).reshape(b, l, heads, d).transpose(0, 2, 1, 3)
        v = (x @ lw["v_w"].T + lw["v_b"]).reshape(b, l, heads, d).transpose(0, 2, 1, 3)
        s = (q * d**-0.5) @ k.transpose(0, 1, 3, 2) + bias
        o = (softmax(s, axis=-1) @ v).transpose(0, 2, 1, 3).reshape(b, l, e)
        o = o @ lw["o_w"].T + lw["o_b"]
        x = layer_norm(x + o, lw["ln1_w"], lw["ln1_b"], eps)
        ff = gelu_exact(x @ lw["ff1_w"].T + lw["ff1_b"]) @ lw["ff2_w"].T + lw["ff2_b"]
        x = layer_norm(ff + x, lw["ln2_w"], lw["ln2_b"], eps)
    return x


def gte_embed(cfg: dict, w: dict, input_ids, token_type_ids, attention_mask):
    """Reference GteModel.__call__ (gte.py:135-143): mean-pool over the
    attention mask, then L2-normalize."""
    y = bert_encode(cfg, w, input_ids, token_type_ids, attention_mask)
    m = np.asarray(attention_mask, np.float32)[..., None]
    emb = (y * m).sum(axis=1) / m.sum(axis=1)
    return emb / np.linalg.norm(emb, ord=2, axis=1)[..., None]
