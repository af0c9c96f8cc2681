"""Phi-3.5-vision image preprocessing — hd_transform multi-crop tiling.

Numerics parity with the reference ``Phi3VImageProcessor``
(/root/reference/phi.py:283-372): portrait images are transposed to
landscape, scaled so the area is ~``num_crops`` 336x336 tiles (PIL bilinear),
height white-padded to a multiple of 336, CLIP mean/std normalized; the
global 336x336 view uses the reference's idiosyncratic 2-tap bicubic
(``interpolate_336``).  The reference implements that bicubic as a quadruple
Python loop (phi.py:365-371); here it is two dense matmuls
``G_h @ img @ G_w^T`` built from the same weights/indices — identical output,
orders of magnitude faster, and trivially JAX-friendly if moved on-device.
"""

from __future__ import annotations

from typing import List

import numpy as np


def _cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax**2
    ax3 = ax**3
    return (1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1) + (
        -0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2
    ) * ((ax > 1) & (ax <= 2))


def _resize_matrix(scale: float, out_size: int, in_size: int) -> np.ndarray:
    """Dense (out_size, in_size) matrix reproducing the reference's 2-tap
    normalized cubic interpolation along one axis (phi.py:333-359)."""
    out_coords = np.linspace(0, in_size - 1, out_size)
    in_coords = out_coords / scale
    left = np.floor(in_coords - 0.5).astype(np.int32)
    right = left + 1
    left = np.clip(left, 0, in_size - 1)
    right = np.clip(right, 0, in_size - 1)
    w_left = _cubic(in_coords - left)
    w_right = _cubic(right - in_coords)
    wsum = w_left + w_right
    nz = wsum != 0
    w_left[nz] /= wsum[nz]
    w_right[nz] /= wsum[nz]
    g = np.zeros((out_size, in_size), np.float64)
    np.add.at(g, (np.arange(out_size), left), w_left)
    np.add.at(g, (np.arange(out_size), right), w_right)
    return g


def _pil_bilinear_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Dense (out_size, in_size) matrix reproducing PIL's BILINEAR resampling
    along one axis: triangle filter, support scaled for antialiased
    downscaling, per-row weight normalization (PIL ``precompute_coeffs``).

    Static per shape pair, so the device resize embeds it as a jit constant —
    the per-call H2D payload is the small ORIGINAL image, not the ~4x bigger
    hd image (through the remote tunnel the hd transfer alone costs ~120 ms).
    PIL rounds through uint8 after resizing; the device path stays in float,
    so outputs differ by <= 1/255 per tap (tolerance-tested)."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter support = 1
    g = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        xs = np.arange(lo, hi)
        w = 1.0 - np.abs((xs + 0.5 - center) / filterscale)
        w = np.clip(w, 0.0, None)
        s = w.sum()
        if s > 0:
            g[i, lo:hi] = w / s
    return g


def interpolate_336(x: np.ndarray) -> np.ndarray:
    """(N, C, H, W) -> (N, C, 336, 336) via separable 2-tap cubic.

    Two dense matmuls (G_h @ img @ G_w^T), NOT an einsum — a 3-operand
    np.einsum without ``optimize`` falls back to the full O(N^4) loop nest.
    """
    n, c, h, w = x.shape
    gh = _resize_matrix(336 / h, 336, h).astype(np.float32)
    gw = _resize_matrix(336 / w, 336, w).astype(np.float32)
    xf = np.ascontiguousarray(x, np.float32).reshape(n * c, h, w)
    out = gh @ xf @ gw.T  # (n*c, 336, 336)
    return out.reshape(n, c, 336, 336).astype(x.dtype)


class Phi3VImageProcessor:
    def __init__(self, num_crops: int = 16):
        self.num_crops = num_crops
        self.image_mean = np.array([0.48145466, 0.4578275, 0.40821073])
        self.image_std = np.array([0.26862954, 0.26130258, 0.27577711])

    def hd_transform_uint8(self, img) -> np.ndarray:
        """PIL image -> (H, W, 3) uint8 hd image: landscape-orient, bilinear
        resize to ~num_crops 336^2 tiles, white-pad height to a 336 multiple,
        un-transpose (reference phi.py:290-310).  Everything *after* this
        (normalize, global bicubic, crop tiling) is pure math and runs
        on-device in the fused prefill (models/vision.py)."""
        from PIL import Image, ImageOps

        img = img.convert("RGB")
        w, h = img.size
        trans = False
        if w < h:
            img = img.transpose(Image.TRANSPOSE)
            trans = True
            w, h = img.size
        scale = int(np.sqrt(self.num_crops * w / h))
        img = img.resize([int(scale * 336), int(scale * 336 * h / w)], Image.BILINEAR)
        _, bh = img.size
        diff = int(np.ceil(bh / 336) * 336) - bh
        top = diff // 2
        img = ImageOps.expand(img, border=(0, top, 0, diff - top), fill=(255, 255, 255))
        if trans:
            img = img.transpose(Image.TRANSPOSE)
        return np.asarray(img, np.uint8)

    def resize_plan(self, img) -> dict:
        """Static hd_transform geometry for one image: everything the device
        resize needs (same arithmetic as hd_transform_uint8, no pixel work).
        """
        w, h = img.size
        trans = w < h
        if trans:
            w, h = h, w
        scale = int(np.sqrt(self.num_crops * w / h))
        rw, rh = int(scale * 336), int(scale * 336 * h / w)
        diff = int(np.ceil(rh / 336) * 336) - rh
        top = diff // 2
        out_h, out_w = rh + diff, rw
        if trans:
            out_h, out_w = out_w, out_h
        return {
            "trans": trans, "src_h": h, "src_w": w, "rh": rh, "rw": rw,
            "pad_top": top, "pad_bot": diff - top,
            "out_h": out_h, "out_w": out_w,
        }

    def normalize(self, arr_u8: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 -> CLIP-normalized (3, H, W) float32."""
        mean = self.image_mean.astype(np.float32)
        std_inv = (1.0 / self.image_std).astype(np.float32)
        arr = (arr_u8.astype(np.float32) * np.float32(1 / 255.0) - mean) * std_inv
        return arr.transpose(2, 0, 1)

    @staticmethod
    def count_tokens(h: int, w: int) -> int:
        return int((h // 336 * w // 336 + 1) * 144 + 1 + (h // 336 + 1) * 12)

    def __call__(self, images, raw: bool = False) -> dict:
        import os

        if raw and os.environ.get("PHI3V_TPU_HOST_RESIZE", "0") != "1":
            # Fully device-side pipeline: ship the ORIGINAL uint8 pixels plus
            # a static resize plan; bilinear resize + pad + normalize + tile
            # all run on-TPU (the hd image is ~4x the original's bytes, and
            # H2D through the remote tunnel is the VQA path's biggest
            # non-FLOP cost).
            plans = [self.resize_plan(img) for img in images]
            shapes = [[p["out_h"], p["out_w"]] for p in plans]
            return {
                "raw_images": [
                    np.asarray(img.convert("RGB"), np.uint8) for img in images
                ],
                "resize_plans": plans,
                "image_sizes": shapes,
                "num_img_tokens": [self.count_tokens(h, w) for h, w in shapes],
            }
        hd_u8 = [self.hd_transform_uint8(img) for img in images]
        shapes = [[im.shape[0], im.shape[1]] for im in hd_u8]
        num_img_tokens = [self.count_tokens(h, w) for h, w in shapes]
        if raw:
            # Device-side pipeline from the host-resized hd image
            # (PHI3V_TPU_HOST_RESIZE=1: exact-PIL-resize parity mode).
            return {
                "hd_images": hd_u8,
                "image_sizes": shapes,
                "num_img_tokens": num_img_tokens,
            }
        max_crops = 17
        hd_images = [self.normalize(im) for im in hd_u8]
        pixel_values = np.zeros(
            (len(hd_images), max_crops, 3, 336, 336), np.float32
        )
        for i, (im, (h, w)) in enumerate(zip(hd_images, shapes)):
            pixel_values[i, 0] = interpolate_336(im[None])[0]
            crops = (
                im.reshape(3, h // 336, 336, w // 336, 336)
                .transpose(1, 3, 0, 2, 4)
                .reshape(-1, 3, 336, 336)
            )
            pixel_values[i, 1 : 1 + crops.shape[0]] = crops
        return {
            "pixel_values": pixel_values,
            "image_sizes": shapes,
            "num_img_tokens": num_img_tokens,
        }
