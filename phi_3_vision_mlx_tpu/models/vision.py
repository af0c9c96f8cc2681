"""CLIP ViT vision tower + Phi-3 image embedding.

Behavioral parity with the reference vision stack
(/root/reference/phi.py:135-226 CLIP, :374-416 ``Phi3ImageEmbedding``):

* ViT-L/14-336 with pre-LN blocks, fast-approx GELU MLP; features are taken
  from the **penultimate** encoder layer with the CLS token dropped
  (phi.py:219-221) — exact behavior matters for image-token parity;
* 2x2 patch pooling via reshape to 4C, learned ``sub_GN`` row separators and
  a ``glb_GN`` separator between sub-crops and the global view
  (phi.py:403-407), then a 2-layer GELU MLP projection to the decoder width;
* image features are scattered into the text embedding at the positions of
  the negative placeholder ids (phi.py:412-415).

TPU-first: the encoder is one ``lax.scan`` over stacked layer params; the
whole tower jits on the static (17, 336, 336, 3) crop batch.  The per-image
reassembly runs eagerly on host-known crop counts (vision is B=1, as in the
reference) and feeds the jitted prefill via ``inputs_embeds``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.config import ClipVisionConfig, ModelConfig
from ..ops.linear import dense, embedding, matmul_precision
from ..ops.norms import layer_norm


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_vision_params(cfg: ModelConfig, key, dtype=None) -> dict:
    v = cfg.vision
    dtype = dtype or jnp.dtype(cfg.dtype)
    e = v.hidden_size
    nl = v.num_hidden_layers
    ks = jax.random.split(key, 10)

    def nrm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    def lin(k, nin, nout, n_layers=None):
        shape = (nin, nout) if n_layers is None else (n_layers, nin, nout)
        bshape = (nout,) if n_layers is None else (n_layers, nout)
        return {"weight": nrm(k, shape, nin**-0.5), "bias": jnp.zeros(bshape, dtype)}

    def ln(n_layers=None, width=e):
        shape = (width,) if n_layers is None else (n_layers, width)
        return {"weight": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    layers = {
        "self_attn": {
            "q_proj": lin(ks[0], e, e, nl),
            "k_proj": lin(ks[1], e, e, nl),
            "v_proj": lin(ks[2], e, e, nl),
            "out_proj": lin(ks[3], e, e, nl),
        },
        "layer_norm1": ln(nl),
        "layer_norm2": ln(nl),
        "mlp": {
            "fc1": lin(ks[4], e, v.intermediate_size, nl),
            "fc2": lin(ks[5], v.intermediate_size, e, nl),
        },
    }
    c4 = cfg.image_dim_out * 4
    return {
        "img_processor": {
            "vision_model": {
                "embeddings": {
                    "class_embedding": jnp.zeros((e,), dtype),
                    "patch_embedding": {
                        "weight": nrm(ks[6], (e, v.patch_size, v.patch_size, 3))
                    },
                    "position_embedding": {
                        "weight": nrm(ks[7], (v.num_positions, e))
                    },
                },
                "pre_layrnorm": ln(),  # sic — HF checkpoint key (phi.py:212)
                "encoder": {"layers": layers},
                "post_layernorm": ln(),
            }
        },
        "glb_GN": jnp.zeros((1, 1, c4), dtype),
        "sub_GN": jnp.zeros((1, 1, 1, c4), dtype),
        "img_projection": {
            "0": lin(ks[8], c4, cfg.hidden_size),
            "2": lin(ks[9], cfg.hidden_size, cfg.hidden_size),
        },
    }


# ---------------------------------------------------------------------------
# CLIP forward
# ---------------------------------------------------------------------------


def _gelu_fast_approx(x):
    """x * sigmoid(1.702 x) — MLX's ``gelu_fast_approx`` used by the CLIP MLP
    (reference phi.py:154)."""
    return x * jax.nn.sigmoid(1.702 * x.astype(jnp.float32)).astype(x.dtype)


def _clip_attention(lp, x, num_heads: int):
    b, l, e = x.shape
    d = e // num_heads
    q = dense(lp["q_proj"], x).reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    k = dense(lp["k_proj"], x).reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    v = dense(lp["v_proj"], x).reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (d**-0.5), k,
        preferred_element_type=jnp.float32,
        precision=matmul_precision(x.dtype),
    )
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        precision=matmul_precision(x.dtype),
    ).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, e)
    return dense(lp["out_proj"], o)


def clip_vision_forward(vparams: dict, vcfg: ClipVisionConfig, pixels_nhwc):
    """(N, 336, 336, 3) crops -> (N, 576, C) penultimate-layer patch features."""
    vm = vparams["img_processor"]["vision_model"]
    emb = vm["embeddings"]
    x = lax.conv_general_dilated(
        pixels_nhwc.astype(emb["patch_embedding"]["weight"].dtype),
        emb["patch_embedding"]["weight"],
        window_strides=(vcfg.patch_size, vcfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "OHWI", "NHWC"),
        precision=matmul_precision(jnp.dtype(emb["patch_embedding"]["weight"].dtype)),
    )
    n = x.shape[0]
    x = x.reshape(n, -1, vcfg.hidden_size)  # (N, 576, C)
    cls = jnp.broadcast_to(
        emb["class_embedding"][None, None, :], (n, 1, vcfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + emb["position_embedding"]["weight"][None]
    x = layer_norm(x, vm["pre_layrnorm"]["weight"], vm["pre_layrnorm"]["bias"],
                   vcfg.layer_norm_eps)

    # Penultimate layer: scan all but the last block (reference phi.py:219-221).
    stacked = jax.tree_util.tree_map(lambda a: a[: vcfg.num_hidden_layers - 1],
                                     vm["encoder"]["layers"])

    def body(carry, lp):
        h = layer_norm(carry, lp["layer_norm1"]["weight"], lp["layer_norm1"]["bias"],
                       vcfg.layer_norm_eps)
        carry = carry + _clip_attention(lp["self_attn"], h, vcfg.num_attention_heads)
        h = layer_norm(carry, lp["layer_norm2"]["weight"], lp["layer_norm2"]["bias"],
                       vcfg.layer_norm_eps)
        h = dense(lp["mlp"]["fc2"], _gelu_fast_approx(dense(lp["mlp"]["fc1"], h)))
        return carry + h, None

    x, _ = lax.scan(body, x, stacked)
    return x[:, 1:]  # drop CLS


# ---------------------------------------------------------------------------
# Image embedding assembly + scatter
# ---------------------------------------------------------------------------


def _project(vparams, x):
    x = dense(vparams["img_projection"]["0"], x)
    x = jax.nn.gelu(x, approximate=False)
    return dense(vparams["img_projection"]["2"], x)


# One compiled pipeline per (h, w) crop-grid shape: CLIP tower + 2x2 pooling
# + separators + projection all under a single jit — the eager op-by-op path
# cost ~50 s per image through the remote-dispatch tunnel.
_IMG_JIT_CACHE: dict = {}


def _image_pipeline(vparams, vcfg: ClipVisionConfig, image_dim_out: int,
                    crops_nchw, h: int, w: int):
    crops = jnp.asarray(crops_nchw).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    feats = clip_vision_forward(vparams, vcfg, crops)  # (17, 576, C)
    c = image_dim_out
    hh = int(feats.shape[1] ** 0.5)  # 24
    nb = h * w

    def reshape_concat(img, shape, tile_shape):
        x = img.reshape(shape).transpose(0, 1, 3, 2, 4, 5).reshape(tile_shape)
        sub = jnp.tile(vparams["sub_GN"], (1, tile_shape[1], 1, 1))
        return jnp.concatenate([x, sub], axis=2).reshape(1, -1, 4 * c)

    glb = reshape_concat(
        feats[:1], (1, hh // 2, 2, hh // 2, 2, c), (1, hh // 2, hh // 2, 4 * c)
    )
    sub = reshape_concat(
        feats[1 : nb + 1], (nb, hh // 2, 2, hh // 2, 2, c), (1, h * 12, w * 12, 4 * c)
    )
    x = jnp.concatenate([sub, vparams["glb_GN"], glb], axis=1)
    return _project(vparams, x)


def compute_image_embeds(params: dict, cfg: ModelConfig, pixel_values, image_sizes):
    """(B, 17, 3, 336, 336) crops -> list of (1, n_tokens_i, hidden) features.

    Mirrors Phi3ImageEmbedding.__call__ (phi.py:393-411).
    """
    vparams = params["model"]["vision_embed_tokens"]
    vcfg = cfg.vision
    b = pixel_values.shape[0]
    sizes = (np.asarray(image_sizes) // 336).tolist()
    pixel_values = np.asarray(pixel_values)
    outs = []
    for i in range(b):
        h, w = int(sizes[i][0]), int(sizes[i][1])
        key = (cfg.architecture, h, w, pixel_values.shape[1])
        if key not in _IMG_JIT_CACHE:
            _IMG_JIT_CACHE[key] = jax.jit(
                lambda vp, cr, _h=h, _w=w: _image_pipeline(
                    vp, vcfg, cfg.image_dim_out, cr, _h, _w
                )
            )
        outs.append(_IMG_JIT_CACHE[key](vparams, jnp.asarray(pixel_values[i])))
    return outs


def _features_from_hd(vparams, vcfg: ClipVisionConfig, image_dim_out: int,
                      x_hwc, grid_h: int, grid_w: int):
    """Shared device tail: CLIP-normalized (H, W, 3) float image -> (1, n, E)
    (global bicubic view, crop tiling, CLIP tower, 2x2 pooling, separators,
    projection)."""
    from .image_processor import _resize_matrix

    h_px, w_px = grid_h * 336, grid_w * 336
    chw = x_hwc.transpose(2, 0, 1)  # (3, H, W)

    # Global 336x336 view: the reference's 2-tap cubic as two matmuls
    # (G_h @ img @ G_w^T); G matrices are static per crop grid.
    gh = jnp.asarray(_resize_matrix(336 / h_px, 336, h_px).astype(np.float32))
    gw = jnp.asarray(_resize_matrix(336 / w_px, 336, w_px).astype(np.float32))
    glb = jnp.einsum(
        "oh,chw,pw->cop", gh, chw, gw, precision=jax.lax.Precision.HIGHEST
    )  # (3, 336, 336)

    crops = (
        chw.reshape(3, grid_h, 336, grid_w, 336)
        .transpose(1, 3, 0, 2, 4)
        .reshape(-1, 3, 336, 336)
    )
    all_crops = jnp.concatenate([glb[None], crops], axis=0)  # (nb+1, 3, 336, 336)
    feats = clip_vision_forward(
        vparams, vcfg, all_crops.transpose(0, 2, 3, 1)
    )  # (nb+1, 576, C)

    c = image_dim_out
    hh = int(feats.shape[1] ** 0.5)
    nb = grid_h * grid_w

    def reshape_concat(img, shape, tile_shape):
        t = img.reshape(shape).transpose(0, 1, 3, 2, 4, 5).reshape(tile_shape)
        sub = jnp.tile(vparams["sub_GN"], (1, tile_shape[1], 1, 1))
        return jnp.concatenate([t, sub], axis=2).reshape(1, -1, 4 * c)

    glb_t = reshape_concat(
        feats[:1], (1, hh // 2, 2, hh // 2, 2, c), (1, hh // 2, hh // 2, 4 * c)
    )
    sub_t = reshape_concat(
        feats[1 : nb + 1],
        (nb, hh // 2, 2, hh // 2, 2, c),
        (1, grid_h * 12, grid_w * 12, 4 * c),
    )
    x = jnp.concatenate([sub_t, vparams["glb_GN"], glb_t], axis=1)
    return _project(vparams, x)


def _normalize_u8(x):
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], jnp.float32)
    std_inv = 1.0 / jnp.asarray([0.26862954, 0.26130258, 0.27577711], jnp.float32)
    return (x.astype(jnp.float32) * (1.0 / 255.0) - mean) * std_inv


def device_image_features(vparams, vcfg: ClipVisionConfig, image_dim_out: int,
                          img_u8, grid_h: int, grid_w: int):
    """Whole image pipeline on device: (H, W, 3) uint8 hd image -> (1, n, E).

    Jit-traceable replacement for the host half of the reference
    ``Phi3VImageProcessor`` (normalize, global-view bicubic, crop tiling —
    phi.py:311-372) fused with the CLIP tower + pooling + projection.  The
    only host work left is PIL's variable-size bilinear resize+pad
    (image_processor.hd_transform_uint8); everything from the uint8 pixels
    onward is one XLA program.
    """
    return _features_from_hd(
        vparams, vcfg, image_dim_out, _normalize_u8(img_u8), grid_h, grid_w
    )


def device_image_features_raw(vparams, vcfg: ClipVisionConfig,
                              image_dim_out: int, orig_u8, plan: dict,
                              grid_h: int, grid_w: int):
    """Image pipeline from the ORIGINAL uint8 pixels: PIL's hd_transform
    bilinear resize runs on device as two static matmuls (weights reproduce
    PIL's triangle filter, image_processor._pil_bilinear_matrix), then white
    pad + normalize + the shared tail.  Shipping the original image instead
    of the ~4x-bigger hd image cuts the dominant H2D cost of VQA prefill
    (~120 ms for a 4 MB hd image through the remote tunnel).
    """
    from .image_processor import _pil_bilinear_matrix

    x = orig_u8
    if plan["trans"]:
        x = x.transpose(1, 0, 2)  # portrait -> landscape (PIL TRANSPOSE)
    rh, rw = plan["rh"], plan["rw"]
    ph = jnp.asarray(_pil_bilinear_matrix(rh, plan["src_h"]).astype(np.float32))
    pw = jnp.asarray(_pil_bilinear_matrix(rw, plan["src_w"]).astype(np.float32))
    xf = x.astype(jnp.float32)  # (src_h, src_w, 3)
    tmp = jnp.tensordot(ph, xf, axes=((1,), (0,)),
                        precision=jax.lax.Precision.HIGHEST)  # (rh, w, 3)
    resized = jnp.tensordot(tmp, pw, axes=((1,), (1,)),
                            precision=jax.lax.Precision.HIGHEST)
    resized = resized.transpose(0, 2, 1)  # (rh, rw, 3)
    resized = jnp.clip(resized, 0.0, 255.0)
    padded = jnp.pad(
        resized,
        ((plan["pad_top"], plan["pad_bot"]), (0, 0), (0, 0)),
        constant_values=255.0,  # white, reference phi.py:308
    )
    if plan["trans"]:
        padded = padded.transpose(1, 0, 2)
    return _features_from_hd(
        vparams, vcfg, image_dim_out, _normalize_u8(padded), grid_h, grid_w
    )


def compute_inputs_embeds(params: dict, cfg: ModelConfig, dict_input: dict):
    """Text embedding with image features scattered at placeholder positions
    (reference phi.py:412-415 + Phi3F embed hook :577-579)."""
    ids = np.asarray(dict_input["input_ids"])
    positions = np.asarray(dict_input["positions"])
    embeds = embedding(params["model"]["embed_tokens"],
                       jnp.asarray(np.maximum(ids, 0)))
    embeds = embeds.astype(jnp.dtype(cfg.dtype))
    img_embeds = compute_image_embeds(
        params, cfg, dict_input["pixel_values"], dict_input["image_sizes"]
    )
    idx = 0
    for feats in img_embeds:
        cnt = feats.shape[1]
        row, col = int(positions[idx][0]), int(positions[idx][1])
        embeds = lax.dynamic_update_slice(
            embeds, feats.astype(embeds.dtype), (row, col, 0)
        )
        idx += cnt
    return embeds
