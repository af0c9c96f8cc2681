"""Native zero-copy safetensors reader vs the reference Python loader."""

import numpy as np
import pytest

from phi_3_vision_mlx_tpu.core import native


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    from safetensors.numpy import save_file

    import ml_dtypes

    d = tmp_path_factory.mktemp("st")
    ref = {
        "model.layers.0.w": np.arange(256, dtype=np.float32).reshape(16, 16),
        "payload.q": (np.arange(330) % 251).astype(np.uint8).reshape(33, 10),
        "x.bf16": np.linspace(0, 1, 64, dtype=np.float32)
        .astype(ml_dtypes.bfloat16)
        .reshape(8, 8),
        "scalar": np.array(3.5, np.float32),
    }
    path = str(d / "t.safetensors")
    save_file(ref, path, metadata={"format": "pt"})
    return path, ref


def test_native_matches_reference_loader(sample):
    if not native.available():
        pytest.skip("no C++ toolchain")
    path, ref = sample
    out = native.load_file_mmap(path)
    assert set(out) == set(ref)
    for k in ref:
        assert out[k].shape == ref[k].shape
        assert out[k].dtype == ref[k].dtype
        np.testing.assert_array_equal(
            np.asarray(out[k], np.float32), np.asarray(ref[k], np.float32)
        )


def test_native_error_on_missing(tmp_path):
    if not native.available():
        pytest.skip("no C++ toolchain")
    with pytest.raises(OSError):
        native.load_file_mmap(str(tmp_path / "nope.safetensors"))


def test_weights_dir_uses_native(tmp_path, monkeypatch):
    """load_safetensors_dir roundtrips through whichever loader is active."""
    from phi_3_vision_mlx_tpu.core import weights as W

    flat = {"a": np.ones((4, 4), np.float32)}
    W.save_safetensors(str(tmp_path / "m.safetensors"), flat)
    out = W.load_safetensors_dir(str(tmp_path))
    np.testing.assert_array_equal(out["a"], flat["a"])
