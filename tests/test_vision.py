"""Vision stack: image preprocessing numerics, token-count formula, and
end-to-end VQA generation on a tiny random vision checkpoint."""

import numpy as np
import pytest
from PIL import Image

from phi_3_vision_mlx_tpu.models.image_processor import (
    Phi3VImageProcessor,
    interpolate_336,
)


def _test_image(w=500, h=300):
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [(xx * 255 // w), (yy * 255 // h), ((xx + yy) * 255 // (w + h))], axis=-1
    ).astype(np.uint8)
    return Image.fromarray(arr)


def test_interpolate_336_identity():
    x = np.random.default_rng(0).normal(size=(1, 3, 336, 336)).astype(np.float32)
    y = interpolate_336(x)
    # At 336->336 the 2-tap cubic has left==right==center -> identity.
    np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-5)


def test_interpolate_336_matches_taps_formula():
    """Cross-check the matrix formulation against an independent gather-based
    evaluation of the reference's 2-tap kernel (phi.py:331-372) — including
    its double-scaled coordinate quirk for inputs larger than 336."""
    from phi_3_vision_mlx_tpu.models.image_processor import _resize_matrix

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 2, 672, 400)).astype(np.float32)

    def taps(in_size):
        scale = 336 / in_size
        out_coords = np.linspace(0, in_size - 1, 336)
        in_coords = out_coords / scale
        left = np.clip(np.floor(in_coords - 0.5).astype(int), 0, in_size - 1)
        right = np.clip(left + 1, 0, in_size - 1)

        def cub(t):
            a = np.abs(t)
            return np.where(
                a <= 1, 1.5 * a**3 - 2.5 * a**2 + 1,
                np.where(a <= 2, -0.5 * a**3 + 2.5 * a**2 - 4 * a + 2, 0.0),
            )

        wl = cub(in_coords - left)
        wr = cub(right - in_coords)
        tot = wl + wr
        nz = tot != 0
        wl[nz] /= tot[nz]
        wr[nz] /= tot[nz]
        return left, right, wl, wr

    hl, hr, hwl, hwr = taps(672)
    wl_, wr_, wwl, wwr = taps(400)
    expected = (
        hwl[:, None] * (wwl[None, :] * x[:, :, hl][:, :, :, wl_]
                        + wwr[None, :] * x[:, :, hl][:, :, :, wr_])
        + hwr[:, None] * (wwl[None, :] * x[:, :, hr][:, :, :, wl_]
                          + wwr[None, :] * x[:, :, hr][:, :, :, wr_])
    )
    got = interpolate_336(x)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_hd_transform_shapes_and_token_count():
    proc = Phi3VImageProcessor()
    out = proc([_test_image(500, 300)])
    pv = out["pixel_values"]
    assert pv.shape[0] == 1 and pv.shape[1] == 17 and pv.shape[2] == 3
    assert pv.shape[3] % 336 == 0 and pv.shape[4] % 336 == 0
    h, w = out["image_sizes"][0]
    # reference formula (phi.py:319)
    expected = int((h // 336 * w // 336 + 1) * 144 + 1 + (h // 336 + 1) * 12)
    assert out["num_img_tokens"][0] == expected


def test_portrait_transposed():
    proc = Phi3VImageProcessor()
    out = proc([_test_image(300, 500)])  # portrait
    h, w = out["image_sizes"][0]
    assert h % 336 == 0 and w % 336 == 0


@pytest.mark.slow
def test_vision_generate_e2e(tmp_path):
    from phi_3_vision_mlx_tpu.api import _load, generate
    from phi_3_vision_mlx_tpu.core import weights as W

    from phi_3_vision_mlx_tpu.models.image_processor import Phi3VImageProcessor

    path = str(tmp_path / "tiny_v")
    W.create_random_checkpoint(path, "tiny_vision", vocab_size=32064)
    lm, proc = _load(path)
    proc.img_processor = Phi3VImageProcessor(num_crops=4)  # CPU-speed config
    assert lm.cfg.has_vision
    out = generate(
        "What is shown in this image?",
        images=[_test_image(125, 75)],
        preload=(lm, proc),
        max_tokens=4,
        verbose=False,
        stream=False,
        mute=True,
    )
    assert isinstance(out, (str, list))


@pytest.mark.slow
def test_vision_processor_merge(tmp_path):
    """Negative placeholder ids + scatter positions (reference phi.py:263-281)."""
    from phi_3_vision_mlx_tpu.core import weights as W
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3VProcessor

    path = str(tmp_path / "tiny_v2")
    W.create_random_checkpoint(path, "tiny_vision", vocab_size=32064)
    proc = Phi3VProcessor(path)
    out = proc("<|image_1|>\nDescribe.", images=[_test_image()])
    ids = out["input_ids"][0]
    n_img = int((ids < 0).sum())
    assert n_img == proc.img_processor([_test_image()])["num_img_tokens"][0]
    assert out["positions"].shape[0] == n_img


@pytest.mark.slow
def test_multi_image_generate(tmp_path):
    """Two images in one prompt: per-image scatter in the fused prefill
    (reference merges multiple <|image_N|> tags, phi.py:263-281)."""
    from phi_3_vision_mlx_tpu.api import _load, generate
    from phi_3_vision_mlx_tpu.core import weights as W

    from phi_3_vision_mlx_tpu.models.image_processor import Phi3VImageProcessor

    path = str(tmp_path / "tiny_v_multi")
    W.create_random_checkpoint(path, "tiny_vision", vocab_size=32064)
    lm, proc = _load(path)
    proc.img_processor = Phi3VImageProcessor(num_crops=4)  # CPU-speed config
    out = generate(
        "Compare these images.",
        images=[_test_image(125, 75), _test_image(75, 125)],
        preload=(lm, proc),
        max_tokens=4,
        verbose=False,
        stream=False,
        mute=True,
    )
    assert isinstance(out, (str, list))


@pytest.mark.slow
def test_device_image_path_matches_host_path(tmp_path, monkeypatch):
    """The fused on-device pipeline (uint8 -> normalize -> bicubic global view
    -> crops -> CLIP -> scatter -> prefill, ONE dispatch) must reproduce the
    host-side pixel_values path bit-for-bit (same math, different residence)."""
    import jax

    from phi_3_vision_mlx_tpu.api import _load
    from phi_3_vision_mlx_tpu.core import weights as W
    from phi_3_vision_mlx_tpu.engine.engine import run_prefill

    from phi_3_vision_mlx_tpu.models.image_processor import Phi3VImageProcessor

    path = str(tmp_path / "tiny_v_dev")
    W.create_random_checkpoint(path, "tiny_vision", vocab_size=32064)
    lm, proc = _load(path)
    # 4 crops / small image: the parity claim is path-equivalence, which is
    # crop-count-independent; 16 crops x3 paths took >1h of CPU compile.
    proc.img_processor = Phi3VImageProcessor(num_crops=4)
    prompt = "<|user|>\n<|image_1|>\nDescribe.<|end|>\n<|assistant|>\n"

    monkeypatch.setenv("PHI3V_TPU_DEVICE_IMAGE", "1")
    monkeypatch.setenv("PHI3V_TPU_HOST_RESIZE", "1")  # exact-PIL hd path
    di_dev = proc(prompt, [_test_image(125, 75)])
    assert "hd_images" in di_dev
    logits_dev, _, _, _ = run_prefill(lm, di_dev, max_tokens=4)

    monkeypatch.setenv("PHI3V_TPU_HOST_RESIZE", "0")
    di_raw = proc(prompt, [_test_image(125, 75)])
    assert "raw_images" in di_raw
    logits_raw, _, _, _ = run_prefill(lm, di_raw, max_tokens=4)

    monkeypatch.setenv("PHI3V_TPU_DEVICE_IMAGE", "0")
    di_host = proc(prompt, [_test_image(125, 75)])
    assert "pixel_values" in di_host
    logits_host, _, _, _ = run_prefill(lm, di_host, max_tokens=4)

    np.testing.assert_allclose(
        np.asarray(logits_dev, np.float32),
        np.asarray(logits_host, np.float32),
        rtol=2e-4, atol=2e-4,
    )
    # The fully-raw path replaces PIL's uint8-rounded bilinear with an exact
    # float equivalent (<= 1 LSB per pixel, test below) — logits track the
    # host path within sanity tolerance, not bit-exactness.
    np.testing.assert_allclose(
        np.asarray(logits_raw, np.float32),
        np.asarray(logits_host, np.float32),
        rtol=0.1, atol=0.1,
    )


def test_device_resize_matches_pil_hd_transform():
    """The static bilinear matrices reproduce PIL's hd_transform resize+pad
    to within 1 uint8 LSB (PIL rounds through uint8; the device stays float)
    — upscale, downscale (antialias support > 1), and portrait transpose."""
    from phi_3_vision_mlx_tpu.models.image_processor import _pil_bilinear_matrix

    proc = Phi3VImageProcessor()
    for w, h in [(500, 300), (300, 500), (640, 480), (2200, 1400)]:
        img = _test_image(w, h)
        hd = proc.hd_transform_uint8(img)
        plan = proc.resize_plan(img)
        x = np.asarray(img.convert("RGB"), np.float64)
        if plan["trans"]:
            x = x.transpose(1, 0, 2)
        ph = _pil_bilinear_matrix(plan["rh"], plan["src_h"])
        pw = _pil_bilinear_matrix(plan["rw"], plan["src_w"])
        # two separable matmuls (a 3-operand np.einsum without optimize=True
        # runs the naive quintuple loop — minutes at 2200x1400)
        tmp = np.tensordot(ph, x, axes=([1], [0]))  # (rh, w, c)
        r = np.tensordot(tmp, pw, axes=([1], [1]))  # (rh, c, rw)
        r = np.clip(r.transpose(0, 2, 1), 0, 255)
        padded = np.pad(
            r, ((plan["pad_top"], plan["pad_bot"]), (0, 0), (0, 0)),
            constant_values=255.0,
        )
        if plan["trans"]:
            padded = padded.transpose(1, 0, 2)
        assert padded.shape == hd.shape, (w, h)
        err = np.max(np.abs(padded - hd.astype(np.float64)))
        assert err <= 1.0, (w, h, err)
