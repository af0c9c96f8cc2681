"""Typed, hashable model configuration.

The reference (/root/reference/phi_3_vision_mlx.py:359-369 `_get_cfg`) loads
``config.json`` into a ``SimpleNamespace`` and overlays runtime kwargs (e.g.
``use_quantized_cache``).  On TPU we need configs to be *hashable static
arguments* to ``jax.jit``, so we use frozen dataclasses with tuple-valued
fields instead.  Architecture dispatch by ``eval`` (reference
phi_3_vision_mlx.py:260-262) is replaced by an explicit registry
(core/registry.py).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

# Token ids fixed by the Phi-3 tokenizer (reference phi_3_vision_mlx.py:42-43).
ID_EOS = 32007  # <|end|>
ID_ASS = 32001  # <|assistant|>


@dataclasses.dataclass(frozen=True)
class RopeScalingConfig:
    """Su-scaled ("longrope") RoPE factors (reference phi.py:487-507)."""

    type: str = "longrope"
    long_factor: Tuple[float, ...] = ()
    short_factor: Tuple[float, ...] = ()


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Group quantization metadata (reference phi_3_vision_mlx.py:291-305).

    ``mode="affine"`` (reference parity, MLX ``nn.quantize``):
    ``w ~= scales[g] * q + biases[g]``, ``q`` in ``[0, 2**bits - 1]``.
    ``mode="symmetric"`` (TPU decode-optimized): ``w ~= scales[g] * (q - mid)``
    with ``mid = 2**(bits-1)`` — drops the bias plane entirely, cutting decode
    HBM traffic ~6% at a small quantization-error cost (see
    tests/test_quant_kernels.py for the measured error ratio).
    """

    group_size: int = 64
    bits: int = 4
    mode: str = "affine"  # "affine" | "symmetric"


@dataclasses.dataclass(frozen=True)
class KVQuantConfig:
    """KV-cache quantization (reference phi.py:528-540 uses 4-bit group-32)."""

    group_size: int = 32
    bits: int = 4


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    """CLIP ViT-L/14-336 config (reference phi.py:375-384)."""

    hidden_size: int = 1024
    image_size: int = 336
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    num_attention_heads: int = 16
    num_channels: int = 3
    num_hidden_layers: int = 24
    patch_size: int = 14

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static configuration for the Phi-3 decoder family.

    Mirrors the fields the reference reads from ``config.json``
    (phi.py:425-507, 565-597) plus runtime flags the reference injects via
    kwargs overlay (``use_quantized_cache``, phi_3_vision_mlx.py:1322).
    """

    architecture: str = "Phi3ForCausalLM"
    vocab_size: int = 32064
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 131072
    original_max_position_embeddings: int = 4096
    rope_scaling: Optional[RopeScalingConfig] = None
    # Vision tower (None for the blind model).
    vision: Optional[ClipVisionConfig] = None
    image_dim_out: int = 1024
    # Weight quantization; None means full precision.
    quantized: Optional[QuantConfig] = None
    # Runtime flags.
    use_quantized_cache: bool = False
    kv_quant: KVQuantConfig = KVQuantConfig()
    dtype: str = "bfloat16"  # compute/storage dtype for fp weights

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def has_vision(self) -> bool:
        return self.vision is not None

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def _rope_scaling_from_dict(d) -> Optional[RopeScalingConfig]:
    if not d:
        return None
    return RopeScalingConfig(
        type=d.get("type", d.get("rope_type", "longrope")),
        long_factor=tuple(float(x) for x in d.get("long_factor", ())),
        short_factor=tuple(float(x) for x in d.get("short_factor", ())),
    )


def config_from_dict(raw: dict, **overrides) -> ModelConfig:
    """Build a ModelConfig from a HF-style config dict (+ runtime overrides).

    Equivalent surface to the reference's ``_get_cfg(path, **kwargs)``
    (phi_3_vision_mlx.py:359-369) but typed and hashable.
    """
    raw = dict(raw)
    raw.update(overrides)
    arch = raw.get("architectures", ["Phi3ForCausalLM"])[0]
    vision = None
    if arch.startswith("Phi3V"):
        vc = raw.get("vision_config") or {}
        vision = ClipVisionConfig(
            **{
                k: vc[k]
                for k in (
                    "hidden_size",
                    "image_size",
                    "intermediate_size",
                    "layer_norm_eps",
                    "num_attention_heads",
                    "num_channels",
                    "num_hidden_layers",
                    "patch_size",
                )
                if k in vc
            }
        )
    quantized = None
    if raw.get("quantized"):
        q = raw["quantized"]
        quantized = QuantConfig(
            group_size=int(q["group_size"]),
            bits=int(q["bits"]),
            mode=str(q.get("mode", "affine")),
        )
    img_cfg = raw.get("img_processor") or {}
    return ModelConfig(
        architecture=arch,
        vocab_size=int(raw.get("vocab_size", 32064)),
        hidden_size=int(raw.get("hidden_size", 3072)),
        intermediate_size=int(raw.get("intermediate_size", 8192)),
        num_hidden_layers=int(raw.get("num_hidden_layers", 32)),
        num_attention_heads=int(raw.get("num_attention_heads", 32)),
        num_key_value_heads=int(raw.get("num_key_value_heads", 32)),
        rms_norm_eps=float(raw.get("rms_norm_eps", 1e-5)),
        rope_theta=float(raw.get("rope_theta", 10000.0)),
        max_position_embeddings=int(raw.get("max_position_embeddings", 131072)),
        original_max_position_embeddings=int(
            raw.get("original_max_position_embeddings", 4096)
        ),
        rope_scaling=_rope_scaling_from_dict(raw.get("rope_scaling")),
        vision=vision,
        image_dim_out=int(img_cfg.get("image_dim_out", 1024)),
        quantized=quantized,
        use_quantized_cache=bool(raw.get("use_quantized_cache", False)),
        dtype=str(raw.get("jax_dtype", raw.get("dtype_override", "bfloat16"))),
    )


def load_config(json_path: str, **overrides) -> ModelConfig:
    try:
        with open(json_path, "r") as f:
            raw = json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(f"Configuration file not found: {json_path}")
    except json.JSONDecodeError:
        raise ValueError(f"Invalid JSON in configuration file: {json_path}")
    return config_from_dict(raw, **overrides)


def config_to_dict(cfg: ModelConfig) -> dict:
    """Serialize back to an HF-style config dict (for saving checkpoints)."""
    d = {
        "architectures": [cfg.architecture],
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "original_max_position_embeddings": cfg.original_max_position_embeddings,
        "model_type": "phi3_v" if cfg.has_vision else "phi3",
        "sanitized": True,
        "jax_dtype": cfg.dtype,
    }
    if cfg.rope_scaling is not None:
        d["rope_scaling"] = {
            "type": cfg.rope_scaling.type,
            "long_factor": list(cfg.rope_scaling.long_factor),
            "short_factor": list(cfg.rope_scaling.short_factor),
        }
    if cfg.has_vision:
        d["img_processor"] = {"image_dim_out": cfg.image_dim_out}
        v = cfg.vision
        d["vision_config"] = {
            "hidden_size": v.hidden_size,
            "image_size": v.image_size,
            "intermediate_size": v.intermediate_size,
            "layer_norm_eps": v.layer_norm_eps,
            "num_attention_heads": v.num_attention_heads,
            "num_channels": v.num_channels,
            "num_hidden_layers": v.num_hidden_layers,
            "patch_size": v.patch_size,
        }
    if cfg.quantized is not None:
        d["quantized"] = {
            "group_size": cfg.quantized.group_size,
            "bits": cfg.quantized.bits,
            "mode": cfg.quantized.mode,
        }
    return d


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------

# LongRoPE su-factors are checkpoint data (config.json of the HF checkpoints);
# they are loaded from disk for real models.  For offline/random checkpoints we
# generate smooth synthetic factors of the right length.
def _synthetic_su_factors(half_dim: int) -> RopeScalingConfig:
    long = tuple(1.0 + 0.05 * i for i in range(half_dim))
    short = tuple(1.0 + 0.002 * i for i in range(half_dim))
    return RopeScalingConfig(type="longrope", long_factor=long, short_factor=short)


def preset(name: str, **overrides) -> ModelConfig:
    """Named configs: 'phi35_mini', 'phi35_vision', 'tiny', 'tiny_vision'."""
    if name == "phi35_mini":
        cfg = ModelConfig(
            architecture="Phi3ForCausalLM",
            rope_scaling=_synthetic_su_factors(48),
        )
    elif name == "phi35_vision":
        cfg = ModelConfig(
            architecture="Phi3VForCausalLM",
            vision=ClipVisionConfig(),
            max_position_embeddings=131072,
            rope_scaling=_synthetic_su_factors(48),
        )
    elif name == "tiny":
        cfg = ModelConfig(
            architecture="Phi3ForCausalLM",
            vocab_size=512,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=512,
            original_max_position_embeddings=128,
            rope_scaling=_synthetic_su_factors(16),
            dtype="float32",
        )
    elif name == "tiny_vision":
        cfg = ModelConfig(
            architecture="Phi3VForCausalLM",
            vocab_size=512,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=2048,
            original_max_position_embeddings=1024,
            rope_scaling=_synthetic_su_factors(16),
            vision=ClipVisionConfig(
                hidden_size=64,
                intermediate_size=128,
                num_attention_heads=4,
                num_hidden_layers=2,
            ),
            image_dim_out=64,
            dtype="float32",
        )
    else:
        raise KeyError(f"unknown preset: {name}")
    if overrides:
        cfg = cfg.replace(**overrides)
        # Keep synthetic su-factors consistent with a possibly-overridden
        # head_dim (real checkpoints carry matching factors in config.json).
        if (
            cfg.rope_scaling is not None
            and len(cfg.rope_scaling.long_factor) != cfg.head_dim // 2
            and "rope_scaling" not in overrides
        ):
            cfg = cfg.replace(rope_scaling=_synthetic_su_factors(cfg.head_dim // 2))
    return cfg
