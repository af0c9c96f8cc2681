"""Real-weight conversion path validated offline with synthetic HF checkpoints.

Generates checkpoints in the *HuggingFace on-disk convention* — HF key names,
(out, in) linear layouts, NCHW conv patch embedding, per-layer (unstacked)
keys, multiple safetensors shards — runs the production conversion
(sanitize_checkpoint / quantize_checkpoint / load_params), and asserts the
loaded pytree equals the generator's values.  This is the offline stand-in
for converting the real microsoft/Phi-3.5-* checkpoints (reference
``_sanitize``/``_quantize``/``_get_wt``, phi_3_vision_mlx.py:276-305,371-374).
"""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from phi_3_vision_mlx_tpu.core import weights as W
from phi_3_vision_mlx_tpu.core.config import config_to_dict, preset
from phi_3_vision_mlx_tpu.models import phi3


def _to_hf_flat(params, cfg):
    """Our pytree -> HF-convention flat dict (the inverse of build_params)."""
    flat = W.flatten_params(params)
    out = {}
    for name, arr in flat.items():
        arr = np.asarray(arr, np.float32)
        field = name.rsplit(".", 1)[-1]
        if field == "weight" and W._is_linear_weight(name) and arr.ndim == 2:
            arr = arr.T  # ours (in, out) -> HF (out, in)
        if "patch_embedding.weight" in name and arr.ndim == 4:
            arr = arr.transpose(0, 3, 1, 2)  # NHWC(OHWI) -> NCHW
        out[name] = arr
    return out


def _write_hf_checkpoint(path, cfg, hf_flat, shards=2):
    import os

    os.makedirs(path, exist_ok=True)
    d = config_to_dict(cfg)
    d.pop("layout", None)
    d.pop("sanitized", None)  # raw HF checkpoints carry neither marker
    with open(f"{path}/config.json", "w") as f:
        json.dump(d, f)
    keys = sorted(hf_flat)
    per = -(-len(keys) // shards)
    for i in range(shards):
        chunk = {k: hf_flat[k] for k in keys[i * per : (i + 1) * per]}
        if chunk:
            W.save_safetensors(
                f"{path}/model-{i:05d}-of-{shards:05d}.safetensors", chunk
            )


def _assert_tree_close(a, b, rtol=1e-5, atol=1e-6):
    ja = jax.tree_util.tree_leaves_with_path(a)
    jb = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert {jax.tree_util.keystr(p) for p, _ in ja} == set(jb)
    for p, v in ja:
        np.testing.assert_allclose(
            np.asarray(v, np.float32), np.asarray(jb[jax.tree_util.keystr(p)], np.float32),
            rtol=rtol, atol=atol, err_msg=jax.tree_util.keystr(p),
        )


@pytest.mark.parametrize("preset_name", ["tiny", "tiny_vision"])
def test_sanitize_roundtrip_from_hf_layout(tmp_path, preset_name):
    cfg = preset(preset_name)
    params = phi3.init_params(cfg, jax.random.PRNGKey(0))
    raw = str(tmp_path / "raw")
    _write_hf_checkpoint(raw, cfg, _to_hf_flat(params, cfg))

    clean = str(tmp_path / "clean")
    W.sanitize_checkpoint(raw, clean)
    cfg2, loaded = W.load_params(clean)
    assert cfg2.architecture == cfg.architecture
    _assert_tree_close(loaded, params)


def test_quantize_from_hf_layout_matches_direct(tmp_path):
    """quantize_checkpoint on an HF-layout dir == quantizing the pytree."""
    cfg = preset("tiny")
    params = phi3.init_params(cfg, jax.random.PRNGKey(1))
    raw = str(tmp_path / "raw_q")
    _write_hf_checkpoint(raw, cfg, _to_hf_flat(params, cfg))

    qdir = str(tmp_path / "q")
    W.quantize_checkpoint(raw, qdir)
    cfg_q, loaded = W.load_params(qdir)
    assert cfg_q.quantized is not None

    from phi_3_vision_mlx_tpu.core.weights import _quantize_tree
    from phi_3_vision_mlx_tpu.core.config import QuantConfig

    expect = _quantize_tree(params, QuantConfig(group_size=64, bits=4))
    _assert_tree_close(loaded, expect, rtol=1e-3, atol=1e-3)


def test_vision_patch_embedding_nchw_transposed(tmp_path):
    """The NCHW->NHWC patch-embed transpose (reference _get_wt, :374) must
    happen exactly once, on raw HF checkpoints only."""
    cfg = preset("tiny_vision")
    params = phi3.init_params(cfg, jax.random.PRNGKey(2))
    raw = str(tmp_path / "raw_v")
    _write_hf_checkpoint(raw, cfg, _to_hf_flat(params, cfg))
    clean = str(tmp_path / "clean_v")
    W.sanitize_checkpoint(raw, clean)
    _, loaded = W.load_params(clean)
    ours = params["model"]["vision_embed_tokens"]["img_processor"]["vision_model"][
        "embeddings"
    ]["patch_embedding"]["weight"]
    theirs = loaded["model"]["vision_embed_tokens"]["img_processor"]["vision_model"][
        "embeddings"
    ]["patch_embedding"]["weight"]
    np.testing.assert_allclose(
        np.asarray(theirs, np.float32), np.asarray(ours, np.float32), rtol=1e-5
    )
