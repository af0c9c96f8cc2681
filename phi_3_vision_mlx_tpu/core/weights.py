"""Checkpoint manager: HF safetensors -> param pytrees, sanitize/quantize,
adapters, random offline checkpoints.

Replaces the reference's weight plumbing (/root/reference/phi_3_vision_mlx.py:
``_setup``:247, ``_load``:257, ``_sanitize``:276, ``_quantize``:291,
``_get_wt``:371).  Differences:

* class dispatch by ``eval`` is replaced by the explicit architecture check in
  :func:`api` / :mod:`core.registry`;
* sanitized/quantized checkpoints are written in **our** layout — linear
  weights transposed to ``(in, out)`` (marked ``"layout": "in_out"`` in the
  config) so load is a pure mmap+stack with no per-tensor transposes;
* LoRA adapters keep the reference's on-disk format byte-for-byte
  (per-layer ``model.layers.N...lora_a/lora_b`` keys in
  ``adapters.safetensors`` + ``adapter_config.json``) for artifact parity
  (BASELINE.md).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    ModelConfig,
    QuantConfig,
    config_from_dict,
    config_to_dict,
    load_config,
)

# Tensors whose ``.weight`` is a linear matmul weight (HF layout (out, in)).
_LINEAR_RE = re.compile(
    r"("
    r"qkv_proj|o_proj|gate_up_proj|down_proj|lm_head"
    r"|q_proj|k_proj|v_proj|out_proj|fc1|fc2|img_projection\.\d+"
    r")\.weight$"
)
# Any "<prefix>.layers.N.<rest>" tensor is stacked along a leading layer axis
# (decoder blocks and the CLIP encoder blocks both scan).
_LAYER_RE = re.compile(r"^(.*layers)\.(\d+)\.(.+)$")


def _is_linear_weight(name: str) -> bool:
    return _LINEAR_RE.search(name) is not None


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Read all shards in a checkpoint dir.

    Prefers the native zero-copy mmap reader (core/native.py; C++ source in
    native/st_mmap.cpp) — tensors alias the page cache and stream to the
    device without a host copy.  Falls back to the ``safetensors`` package.
    """
    loader = None
    if os.environ.get("PHI3V_TPU_NATIVE_IO", "1") == "1":
        try:
            from . import native

            if native.available():
                loader = native.load_file_mmap
        except Exception:
            loader = None
    if loader is None:
        from safetensors.numpy import load_file as loader

    flat: Dict[str, np.ndarray] = {}
    for wf in sorted(glob.glob(f"{path}/*.safetensors")):
        flat.update(loader(wf))
    if not flat:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    return flat


def save_safetensors(path: str, flat: Dict[str, np.ndarray]):
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, path)


# ---------------------------------------------------------------------------
# flat dict <-> pytree
# ---------------------------------------------------------------------------


def _assign(tree: dict, dotted: str, value):
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def build_params(
    cfg: ModelConfig,
    flat: Dict[str, np.ndarray],
    *,
    pre_transposed: bool = False,
    target_dtype=None,
) -> dict:
    """Assemble the model pytree: stack per-layer tensors, transpose linears.

    Args:
      pre_transposed: True for our sanitized checkpoints (layout "in_out").
      target_dtype: cast fp tensors (not quantized payloads) to this dtype.
    """
    target_dtype = target_dtype or jnp.dtype(cfg.dtype)
    # prefix -> {layer_idx -> subtree}
    layer_groups: dict = {}
    tree: dict = {"model": {}}

    def prep(name: str, arr: np.ndarray, field: str):
        if field == "weight" and arr.dtype.kind in "fiu" and _is_linear_weight(name):
            if arr.dtype.kind == "f" and not pre_transposed:
                arr = arr.T
            elif arr.dtype.kind in "iu" and not pre_transposed:
                arr = arr.T  # quantized payload saved (out,in) by others
        if field in ("scales", "biases") and not pre_transposed:
            arr = arr.T
        if arr.dtype.kind == "f":
            arr = np.asarray(arr)
            want = np.dtype(target_dtype)
            if arr.dtype != want:
                arr = jnp.asarray(arr).astype(target_dtype)
        # Raw HF vision checkpoints store the conv patch embedding NCHW; we
        # run NHWC convs (reference transposes the same way, _get_wt :374).
        return arr

    for name, arr in flat.items():
        field = name.rsplit(".", 1)[-1]
        if "patch_embedding.weight" in name and arr.ndim == 4 and arr.shape[1] in (3,):
            arr = arr.transpose(0, 2, 3, 1)  # NCHW -> NHWC (OHWI)
        m = _LAYER_RE.match(name)
        if m:
            prefix, i, rest = m.group(1), int(m.group(2)), m.group(3)
            _assign(
                layer_groups.setdefault(prefix, {}).setdefault(i, {}),
                rest,
                prep(name, arr, field),
            )
        else:
            _assign(tree, name, prep(name, arr, field))

    # Stack each per-layer subtree group along a leading layer axis.
    for prefix, by_idx in layer_groups.items():
        n = max(by_idx) + 1
        subtrees = [by_idx[i] for i in range(n)]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], axis=0), *subtrees
        )
        _assign(tree, prefix, stacked)
    return tree


def flatten_params(params: dict) -> Dict[str, np.ndarray]:
    """Pytree -> flat {dotted_name: np.ndarray}, unstacking every stacked
    ``...layers`` subtree back to per-layer keys."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, prefix, stacked):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k, stacked or k == "layers")
        else:
            arr = np.asarray(node)
            if stacked:
                m = re.match(r"^(.*layers)\.(.+)$", prefix)
                base, rest = m.group(1), m.group(2)
                for i in range(arr.shape[0]):
                    out[f"{base}.{i}.{rest}"] = arr[i]
            else:
                out[prefix] = arr

    walk(params, "", False)
    return out


# ---------------------------------------------------------------------------
# Checkpoint save / convert
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, cfg: ModelConfig, params: dict, shard_gb: float = 4.0):
    """Write config.json + model safetensors (sharded) in our layout."""
    os.makedirs(path, exist_ok=True)
    d = config_to_dict(cfg)
    d["layout"] = "in_out"
    with open(f"{path}/config.json", "w") as f:
        json.dump(d, f, indent=2)
    flat = flatten_params(params)
    # Shard by size so single files stay mmap-friendly.
    shards: list[dict] = [{}]
    size = 0
    limit = int(shard_gb * (1 << 30))
    for k, v in flat.items():
        if size + v.nbytes > limit and shards[-1]:
            shards.append({})
            size = 0
        shards[-1][k] = v
        size += v.nbytes
    for i, shard in enumerate(shards):
        suffix = f"-{i:05d}-of-{len(shards):05d}" if len(shards) > 1 else ""
        save_safetensors(f"{path}/model{suffix}.safetensors", shard)


def _quantize_tree(params: dict, qcfg: QuantConfig) -> dict:
    """Quantize every linear + embedding leaf (parity with MLX ``nn.quantize``
    over the whole model, reference phi_3_vision_mlx.py:296)."""
    from ..ops.quant import quantize

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        if "weight" in node and not isinstance(node["weight"], dict):
            w = node["weight"]
            name = ".".join(path)
            is_embed = path and path[-1] in ("embed_tokens",)

            def as_node(t):
                out = {"weight": t.q, "scales": t.scales}
                if t.biases is not None:
                    out["biases"] = t.biases
                return out

            if is_embed:
                if w.shape[-1] % qcfg.group_size == 0:
                    t = quantize(
                        jnp.asarray(w), qcfg.group_size, qcfg.bits, axis=-1,
                        mode=qcfg.mode,
                    )
                    return as_node(t)
                return node
            if _is_linear_weight(name + ".weight") and w.ndim >= 2:
                kdim = w.shape[-2]
                if kdim % qcfg.group_size == 0:
                    t = quantize(
                        jnp.asarray(w), qcfg.group_size, qcfg.bits, axis=-2,
                        mode=qcfg.mode,
                    )
                    out = as_node(t)
                    if "bias" in node:
                        out["bias"] = node["bias"]
                    return out
                return node
            return node
        return {k: walk(v, path + [k]) for k, v in node.items()}

    return walk(params, [])


def sanitize_checkpoint(from_path: str, to_path: str, **cfg_overrides):
    """Raw HF dir -> consolidated checkpoint in our layout (reference
    ``_sanitize``, phi_3_vision_mlx.py:276-288)."""
    cfg = load_config(f"{from_path}/config.json", **cfg_overrides)
    flat = load_safetensors_dir(from_path)
    params = build_params(cfg, flat)
    save_checkpoint(to_path, cfg, params)
    _copy_tokenizer_files(from_path, to_path)
    return cfg


def quantize_checkpoint(
    from_path: str, to_path: str, q_group_size: int = 64, q_bits: int = 4
):
    """Raw/sanitized dir -> 4-bit group-64 quantized checkpoint (reference
    ``_quantize``, phi_3_vision_mlx.py:291-305)."""
    cfg = load_config(f"{from_path}/config.json")
    flat = load_safetensors_dir(from_path)
    raw_cfg = json.load(open(f"{from_path}/config.json"))
    params = build_params(cfg, flat, pre_transposed=raw_cfg.get("layout") == "in_out")
    qcfg = QuantConfig(group_size=q_group_size, bits=q_bits)
    params = _quantize_tree(params, qcfg)
    save_checkpoint(to_path, cfg.replace(quantized=qcfg), params)
    _copy_tokenizer_files(from_path, to_path)


def _copy_tokenizer_files(from_path: str, to_path: str):
    import shutil

    for f in glob.glob(f"{from_path}/*.json") + glob.glob(f"{from_path}/*.model"):
        base = os.path.basename(f)
        if base == "config.json":
            continue
        try:
            shutil.copy(f, to_path)
        except OSError:
            pass


def create_random_checkpoint(path: str, preset_name: str, seed: int = 0, **overrides):
    """Materialize a random-weight checkpoint dir (offline test/bench path —
    this environment has no network egress, so ``_setup``-style HF downloads
    are impossible; real deployments call :func:`download_and_convert`)."""
    from ..models.phi3 import init_params
    from .config import preset

    cfg = preset(preset_name, **overrides)
    params = init_params(cfg, jax.random.PRNGKey(seed))
    save_checkpoint(path, cfg, params)
    return cfg


def download_and_convert(hub_id: str, local_path: str, quantized_path: str):
    """HF snapshot -> sanitized + quantized local dirs (reference ``_setup``,
    phi_3_vision_mlx.py:247-255).  Requires network access."""
    from huggingface_hub import snapshot_download

    raw = snapshot_download(repo_id=hub_id, allow_patterns=["*.safetensors", "*.json"])
    sanitize_checkpoint(raw, local_path)
    quantize_checkpoint(raw, quantized_path)


# ---------------------------------------------------------------------------
# Load
# ---------------------------------------------------------------------------


def kernelize_params(params: dict, cfg: ModelConfig) -> dict:
    """Convert decoder-linear quantized payloads to the Pallas kernel's
    interleaved int8 layout (ops/kernels/quant_matmul.py).  Only leaves whose
    dims fit the kernel blocks are converted; everything else keeps the
    (K, N) uint8 fallback layout.  No-op for unquantized models."""
    if cfg.quantized is None:
        return params
    import os as _os

    from ..ops.kernels.quant_matmul import BLOCK_K, to_kernel_layout, to_tiled_layout

    bk = int(_os.environ.get("PHI3V_TPU_TILE_K", "3072"))
    bn = int(_os.environ.get("PHI3V_TPU_TILE_N", "1024"))

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        if "scales" in node and "weight" in node and not isinstance(node["weight"], dict):
            q = node["weight"]
            s, b = node["scales"], node.get("biases")
            # lm_head's vocab dim (32064) is not block-aligned: zero-pad its
            # output columns (the model slices logits back to vocab_size).
            if (
                path and path[-1] == "lm_head"
                and q.ndim == 2
                and q.shape[-1] % bn != 0
                and q.dtype == jnp.uint8
            ):
                pad = -q.shape[-1] % bn
                q = jnp.pad(q, ((0, 0), (0, pad)))
                s = jnp.pad(s, ((0, 0), (0, pad)))
                b = None if b is None else jnp.pad(b, ((0, 0), (0, pad)))
            if (
                q.dtype == jnp.uint8
                and q.ndim >= 2
                and q.shape[-2] % BLOCK_K == 0
                and q.shape[-1] % 512 == 0
                # linear leaves have scales (K//g, N); embeddings (V, E//g)
                and s.shape[-1] == q.shape[-1]
            ):
                out = dict(node)
                out.pop("biases", None)
                if cfg.quantized.bits == 4:
                    # Tiled-contiguous layout: each kernel DMA is one linear
                    # HBM read (ops/kernels/quant_matmul.py v2).
                    def tile(qq, ss, bb):
                        k_, n_ = qq.shape[-2], qq.shape[-1]
                        bk_eff = next(
                            c
                            for c in (bk, 3072, 2048, 1024, 512)
                            if c <= k_ and k_ % c == 0
                        )
                        bn_eff = next(c for c in (bn, 1024, 512) if n_ % c == 0)
                        return to_tiled_layout(qq, ss, bb, block_k=bk_eff, block_n=bn_eff)
                    if q.ndim == 2:
                        qp, s, b = tile(q, s, b)
                    else:  # stacked layers: vmap over the layer axis
                        if b is None:
                            qp, s, _ = jax.vmap(lambda qq, ss: tile(qq, ss, None))(q, s)
                            b = None
                        else:
                            qp, s, b = jax.vmap(tile)(q, s, b)
                else:
                    # 8-bit: interleaved int8 layout (no nibble packing).
                    if b is None:
                        raise NotImplementedError(
                            "symmetric mode is 4-bit only (ops/quant.py)"
                        )
                    if q.ndim == 2:
                        qp, s, b = to_kernel_layout(q, s, b)
                    else:
                        qp, s, b = jax.vmap(to_kernel_layout)(q, s, b)
                out.update({"weight": qp, "scales": s})
                if b is not None:
                    out["biases"] = b
                return out
            return node
        return {k: walk(v, path + [k]) for k, v in node.items()}

    return walk(params, [])


def load_params(model_path: str, **cfg_overrides):
    """Checkpoint dir -> (cfg, params pytree)."""
    raw_cfg = json.load(open(f"{model_path}/config.json"))
    cfg = config_from_dict(raw_cfg, **cfg_overrides)
    flat = load_safetensors_dir(model_path)
    params = build_params(
        cfg, flat, pre_transposed=raw_cfg.get("layout") == "in_out"
    )
    return cfg, params


def load_adapter(params: dict, cfg: ModelConfig, adapter_path: str) -> dict:
    """Merge a reference-format LoRA adapter into the pytree.

    ``adapters.safetensors`` holds per-layer ``model.layers.N.<target>.lora_a``
    (K, r) and ``.lora_b`` (r, N) (reference TrainingCallback save,
    phi.py:54-56).  Layers without adapter weights get zero A/B (B=0 makes
    LoRA an exact no-op), so the stacked scan stays uniform.
    """
    from safetensors.numpy import load_file

    lora_cfg = json.load(open(f"{adapter_path}/adapter_config.json"))
    flat = load_file(f"{adapter_path}/adapters.safetensors")
    scale = float(
        lora_cfg.get("lora_parameters", {}).get("scale", 1.0)
        * (
            lora_cfg.get("lora_parameters", {}).get("alpha", 1.0)
            / max(lora_cfg.get("lora_parameters", {}).get("rank", 1), 1)
        )
    )
    nl = cfg.num_hidden_layers
    per_target: dict[str, dict[int, dict[str, np.ndarray]]] = {}
    for k, v in flat.items():
        m = re.match(r"^model\.layers\.(\d+)\.(.+)\.(lora_a|lora_b)$", k)
        if not m:
            continue
        i, target, field = int(m.group(1)), m.group(2), m.group(3)
        per_target.setdefault(target, {}).setdefault(i, {})[field] = v

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    layers = params["model"]["layers"]
    for target, by_layer in per_target.items():
        node = layers
        for part in target.split("."):
            node = node[part]
        any_a = next(iter(by_layer.values()))["lora_a"]
        r = any_a.shape[-1]
        kdim = any_a.shape[0]
        ndim = next(iter(by_layer.values()))["lora_b"].shape[-1]
        a = np.zeros((nl, kdim, r), np.float32)
        b = np.zeros((nl, r, ndim), np.float32)
        for i, fields in by_layer.items():
            a[i] = fields["lora_a"]
            b[i] = fields["lora_b"]
        node["lora_a"] = jnp.asarray(a)
        node["lora_b"] = jnp.asarray(b)
        node["lora_scale"] = jnp.full((nl,), scale, jnp.float32)
    return params
