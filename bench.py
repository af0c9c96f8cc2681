"""Driver benchmark: single-stream decode TPS for 4-bit Phi-3.5-mini.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: 61.01 tok/s — the reference's 4-bit quantized text-generation TPS
on Apple M1 Max (BASELINE.md).  North star (BASELINE.json): >=2x per v5e chip.

Weights are synthetic (this environment has no egress to HuggingFace), but
the model is the full Phi-3.5-mini architecture at full size with 4-bit
group-64 affine-quantized weights — decode cost is identical to real
checkpoints.
"""

import json
import os
import sys
import time

os.environ.setdefault("PHI3V_TPU_DECODE_CHUNK", "256")
os.environ.setdefault("PHI3V_TPU_DECODE_CHUNK_MIN", "256")

import jax
import jax.numpy as jnp

# Persistent compilation cache: remote (tunnel) compiles of the full-size
# model cost ~10-15 min per fresh process; cached reloads are instant.
# Opt out with JAX_COMPILATION_CACHE_DIR=""; keys include jax version,
# backend, and program, so stale entries are never wrongly reused.
_cc = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
if _cc:
    jax.config.update("jax_compilation_cache_dir", _cc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_TPS = 61.01


def synth_quantized_params(cfg, key):
    """Full-size quantized param pytree with random payloads (fast to build)."""
    e, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    h, kv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    nl, g = cfg.num_hidden_layers, cfg.quantized.group_size
    symmetric = cfg.quantized.mode == "symmetric"
    op = (h + 2 * kv) * d
    ks = iter(jax.random.split(key, 16))

    def q(shape):
        payload = jax.random.randint(next(ks), shape, 0, 16, jnp.uint8)
        groups = shape[-2] // g
        sshape = shape[:-2] + (groups, shape[-1])
        scale = jnp.full(sshape, 0.004, jnp.bfloat16) * (
            1.0 + 0.1 * jax.random.normal(next(ks), sshape, jnp.bfloat16)
        )
        out = {"weight": payload, "scales": scale}
        if not symmetric:
            out["biases"] = jnp.full(sshape, -0.03, jnp.bfloat16)
        return out

    def q_embed(shape):
        payload = jax.random.randint(next(ks), shape, 0, 16, jnp.uint8)
        groups = shape[-1] // g
        sshape = shape[:-1] + (groups,)
        out = {
            "weight": payload,
            "scales": jnp.full(sshape, 0.004, jnp.bfloat16),
        }
        if not symmetric:
            out["biases"] = jnp.full(sshape, -0.03, jnp.bfloat16)
        return out

    return {
        "model": {
            "embed_tokens": q_embed((v, e)),
            "layers": {
                "self_attn": {"qkv_proj": q((nl, e, op)), "o_proj": q((nl, h * d, e))},
                "mlp": {
                    "gate_up_proj": q((nl, e, 2 * i)),
                    "down_proj": q((nl, i, e)),
                },
                "input_layernorm": {"weight": jnp.ones((nl, e), jnp.bfloat16)},
                "post_attention_layernorm": {
                    "weight": jnp.ones((nl, e), jnp.bfloat16)
                },
            },
            "norm": {"weight": jnp.ones((e,), jnp.bfloat16)},
        },
        "lm_head": q((e, v)),
    }


def main():
    from phi_3_vision_mlx_tpu.core.config import QuantConfig, preset
    from phi_3_vision_mlx_tpu.engine.engine import LM, generate_text
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3Processor
    from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer

    mode = os.environ.get("BENCH_QUANT_MODE", "affine")
    cfg = preset("phi35_mini").replace(
        quantized=QuantConfig(group_size=64, bits=4, mode=mode)
    )
    params = synth_quantized_params(cfg, jax.random.PRNGKey(0))
    if (
        jax.default_backend() == "tpu"
        and os.environ.get("PHI3V_TPU_QUANT_KERNEL", "1") == "1"
    ):
        from phi_3_vision_mlx_tpu.core.weights import kernelize_params

        params = kernelize_params(params, cfg)
    jax.block_until_ready(params)
    lm = LM(cfg, params)
    processor = Phi3Processor(tokenizer=ByteTokenizer())

    prompt = (
        "<|user|>\nWrite a detailed mystery story set in a lighthouse on a "
        "remote island, where the keeper discovers a coded journal from the "
        "previous keeper who vanished without a trace.<|end|>\n<|assistant|>\n"
    )
    max_tokens = int(os.environ.get("BENCH_MAX_TOKENS", "512"))

    # Warmup (compile prefill + decode chunk)
    generate_text(
        lm, processor, prompt, max_tokens=max_tokens, verbose=False,
        stream=False, mute=True, return_tps=True,
    )
    # Measured run
    best = 0.0
    for _ in range(int(os.environ.get("BENCH_REPS", "2"))):
        _, gen_tps = generate_text(
            lm, processor, prompt, max_tokens=max_tokens, verbose=False,
            stream=False, mute=True, return_tps=True,
        )
        best = max(best, gen_tps)

    print(
        json.dumps(
            {
                "metric": "decode_tps_phi35_mini_int4",
                "value": round(best, 2),
                "unit": "tok/s",
                "vs_baseline": round(best / BASELINE_TPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
