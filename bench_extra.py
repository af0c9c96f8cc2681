"""Side benchmarks beyond the driver metric -> BENCH_EXTRA.json.

Workloads (BASELINE.md configs + ROADMAP long-context targets):
  single    - 4-bit single-stream decode (the driver metric, for context)
  batch15   - reference benchmark() batch prompt list (15 prompts), aggregate tok/s
  dense8k   - dense-cache decode in an 8K window
  quant8k   - int4 group-32 quantized-KV decode in an 8K window
  quant32k  - quantized-KV decode in a 32K window (BASELINE config 5)
  prefill32k- 32K-token prefill throughput (chunked prefill + flash kernel)
  vqa       - single-image VQA prefill latency
  vqa_decode- image-captioning decode TPS (reference README rows)
  lora_decode- decode TPS with a LoRA adapter over the int4 base
  chat      - interactive profile: first-token latency, adaptive chunk ramp
  serve     - continuous-batching aggregate throughput (staggered requests)
  spec      - prompt-lookup speculative decode (overhead + cycling bound)
  spec_mid  - mid-envelope acceptance on a from-scratch-trained induction LM
  quant64k  - (full-chip HBM only; not in the default run)

Run all: ``python bench_extra.py``; subset: ``python bench_extra.py quant8k``.
Each workload prints one JSON line; results merge into BENCH_EXTRA.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("PHI3V_TPU_DECODE_CHUNK", "256")
os.environ.setdefault("PHI3V_TPU_DECODE_CHUNK_MIN", "256")
# Match the driver metric's default (bench.py runs affine); symmetric runs
# (BENCH_QUANT_MODE=symmetric) are recorded distinctly via the quant_mode
# field below, so the two modes never conflate under one metric key.
os.environ.setdefault("BENCH_QUANT_MODE", "affine")

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
import numpy as np


def _lm(quantize_cache=False):
    from bench import synth_quantized_params
    from phi_3_vision_mlx_tpu.core.config import QuantConfig, preset
    from phi_3_vision_mlx_tpu.engine.engine import LM
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3Processor
    from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer

    cfg = preset("phi35_mini").replace(
        quantized=QuantConfig(
            group_size=64, bits=4, mode=os.environ["BENCH_QUANT_MODE"]
        ),
        use_quantized_cache=quantize_cache,
    )
    params = synth_quantized_params(cfg, jax.random.PRNGKey(0))
    if jax.default_backend() == "tpu":
        from phi_3_vision_mlx_tpu.core.weights import kernelize_params

        params = kernelize_params(params, cfg)
    jax.block_until_ready(params)
    return LM(cfg, params), Phi3Processor(tokenizer=ByteTokenizer())


def _decode_tps(lm, proc, prompt_chars: int, max_tokens: int, reps: int = 2):
    from phi_3_vision_mlx_tpu.engine.engine import generate_text

    prompt = ("The lighthouse keeper wrote: " + "x" * 50) * (prompt_chars // 79 + 1)
    prompt = prompt[:prompt_chars]
    best = 0.0
    for _ in range(reps + 1):  # first run compiles
        _, tps = generate_text(
            lm, proc, prompt, max_tokens=max_tokens, verbose=False,
            stream=False, mute=True, return_tps=True,
        )
        best = max(best, tps)
    return best


def single():
    lm, proc = _lm()
    tps = _decode_tps(lm, proc, 150, 512)
    return {"metric": "decode_tps_phi35_mini_int4", "value": round(tps, 2),
            "unit": "tok/s", "reference": 61.01, "ratio": round(tps / 61.01, 2)}


def batch15():
    """The reference's own batch workload: its benchmark() prompt list (16
    literals, 15 prompts after the missing-comma concatenation —
    phi_3_vision_mlx.py:1227-1248, reproduced in bench.BENCH_PROMPTS)."""
    from phi_3_vision_mlx_tpu.bench import BENCH_PROMPTS
    from phi_3_vision_mlx_tpu.engine.engine import generate_text

    lm, proc = _lm()
    prompts = list(BENCH_PROMPTS[2][0])
    assert len(prompts) == 15, len(prompts)
    best = 0.0
    for _ in range(3):
        _, tps = generate_text(
            lm, proc, prompts, max_tokens=256, verbose=False,
            stream=False, mute=True, return_tps=True,
        )
        best = max(best, tps)
    return {"metric": "batched15_decode_tps_int4", "value": round(best, 2),
            "unit": "tok/s aggregate", "reference_q_model": 149.23,
            "ratio_vs_q": round(best / 149.23, 2), "reference_best": 236.6,
            "ratio_vs_best": round(best / 236.6, 2),
            "note": "reference benchmark() batch prompt list (15 prompts)"}


def _window_tps(window: int, quantize_cache: bool, max_tokens: int = 384):
    # prompt padded so l_pad + max_tokens rounds up to `window`
    lm, proc = _lm(quantize_cache=quantize_cache)
    prompt_tokens = window - max_tokens - 64
    return _decode_tps(lm, proc, prompt_tokens, max_tokens, reps=1)


def dense8k():
    tps = _window_tps(8192, False)
    return {"metric": "decode_tps_dense_cache_8k_window", "value": round(tps, 2),
            "unit": "tok/s"}


def quant8k():
    tps = _window_tps(8192, True)
    return {"metric": "decode_tps_quantized_cache_8k_window",
            "value": round(tps, 2), "unit": "tok/s",
            "note": "reference's quantized cache: 18.68 tok/s at ~0.6K window, "
                    "degrading with length"}


def quant32k():
    tps = _window_tps(32768, True, max_tokens=256)
    return {"metric": "decode_tps_quantized_cache_32k_window",
            "value": round(tps, 2), "unit": "tok/s",
            "note": "BASELINE config 5 window (32K quantized-cache decode)"}


def quant48k():
    """48K window: the fraction's single-chip ceiling — cache (4.8 GB payload
    + 1.2 GB scales) + 1.9 GB weights ~ 7.9 GB just fits its ~8 GB HBM.
    64K (~9.9 GB total) OOMs; beyond that is multi-chip KV head sharding."""
    tps = _window_tps(49152, True, max_tokens=128)
    return {"metric": "decode_tps_quantized_cache_48k_window",
            "value": round(tps, 2), "unit": "tok/s",
            "note": "largest single-chip window on the v5e fraction"}


def vqa():
    from phi_3_vision_mlx_tpu.core.config import QuantConfig, preset
    from phi_3_vision_mlx_tpu.core import weights as W
    from phi_3_vision_mlx_tpu.engine.engine import LM, generate_text
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3VProcessor
    from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer
    from PIL import Image

    from bench import synth_quantized_params
    from phi_3_vision_mlx_tpu.models.vision import init_vision_params

    # Quantized decoder weights synthesized directly (building full fp params
    # on device and quantizing OOMs the fractional chip); the CLIP tower runs
    # bf16 (its prefill is compute-bound; quantization would not change the
    # latency picture).
    qcfg = QuantConfig(group_size=64, bits=4, mode=os.environ["BENCH_QUANT_MODE"])
    cfg = preset("phi35_vision").replace(quantized=qcfg)
    params = synth_quantized_params(cfg, jax.random.PRNGKey(0))
    params["model"]["vision_embed_tokens"] = init_vision_params(
        cfg, jax.random.PRNGKey(1), jnp.bfloat16
    )
    if jax.default_backend() == "tpu":
        params = W.kernelize_params(params, cfg)
    jax.block_until_ready(params)
    lm = LM(cfg, params)
    proc = Phi3VProcessor(tokenizer=ByteTokenizer())
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (480, 640, 3), np.uint8))

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        ptps, _ = generate_text(
            lm, proc, "<|image_1|>\nWhat is shown in this image?", images=[img],
            max_tokens=2, verbose=False, stream=False, mute=True, return_tps=True,
        )
        dt = 1e3 * (time.perf_counter() - t0)
        best = dt if best is None else min(best, dt)
    return {"metric": "vqa_prefill_ms", "value": round(best, 1), "unit": "ms",
            "target_ms": 500,
            "note": "end-to-end: image prep + prefill + 2-token decode"}


def vqa_decode(quantize_cache=False):
    """Image-captioning gen TPS (BASELINE rows README.md:277): decode speed
    after a single-image prefill — the reference's 4-bit vision model
    decodes at 44.26 tok/s, its quantized-KV vision path collapses to 5.56
    (``quantize_cache=True`` measures that row's counterpart here)."""
    from phi_3_vision_mlx_tpu.core.config import QuantConfig, preset
    from phi_3_vision_mlx_tpu.core import weights as W
    from phi_3_vision_mlx_tpu.engine.engine import LM, generate_text
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3VProcessor
    from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer
    from PIL import Image

    from bench import synth_quantized_params
    from phi_3_vision_mlx_tpu.models.vision import init_vision_params

    qcfg = QuantConfig(group_size=64, bits=4, mode=os.environ["BENCH_QUANT_MODE"])
    cfg = preset("phi35_vision").replace(
        quantized=qcfg, use_quantized_cache=quantize_cache
    )
    params = synth_quantized_params(cfg, jax.random.PRNGKey(0))
    params["model"]["vision_embed_tokens"] = init_vision_params(
        cfg, jax.random.PRNGKey(1), jnp.bfloat16
    )
    if jax.default_backend() == "tpu":
        params = W.kernelize_params(params, cfg)
    jax.block_until_ready(params)
    lm = LM(cfg, params)
    proc = Phi3VProcessor(tokenizer=ByteTokenizer())
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (480, 640, 3), np.uint8))
    best = 0.0
    for _ in range(3):
        _, tps = generate_text(
            lm, proc, "<|image_1|>\nDescribe this image in detail.",
            images=[img], max_tokens=100, verbose=False, stream=False,
            mute=True, return_tps=True,
        )
        best = max(best, tps)
    if quantize_cache:
        return {"metric": "vqa_decode_tps_int4_qcache", "value": round(best, 2),
                "unit": "tok/s", "reference_q_cache": 5.56,
                "ratio_vs_qcache": round(best / 5.56, 2),
                "note": "100-token generation after single-image prefill, "
                        "int4-quantized KV cache (the reference's quantized-"
                        "cache captioning row collapses to 5.56 tok/s)"}
    return {"metric": "vqa_decode_tps_int4", "value": round(best, 2),
            "unit": "tok/s", "reference_q_model": 44.26,
            "ratio_vs_q": round(best / 44.26, 2),
            "note": "100-token generation after single-image prefill "
                    "(reference 'Image captioning' rows)"}


def vqa_decode_qcache():
    return vqa_decode(quantize_cache=True)


def lora_decode():
    """Decode TPS with a LoRA adapter injected over the int4 base
    (BASELINE 'LoRA adapter' rows; the reference's fp16+LoRA single-stream
    row is 24.72 tok/s)."""
    from phi_3_vision_mlx_tpu.engine.engine import generate_text
    from phi_3_vision_mlx_tpu.train.lora import inject_lora

    lm, proc = _lm()
    params, _ = inject_lora(
        lm.params, lm.cfg, ["self_attn.qkv_proj"], 5, 16, jax.random.PRNGKey(2)
    )
    lm.params = params
    prompt = "Write a mystery story set in a lighthouse."
    best = 0.0
    for _ in range(3):
        _, tps = generate_text(
            lm, proc, prompt, max_tokens=256, verbose=False, stream=False,
            mute=True, return_tps=True,
        )
        best = max(best, tps)
    return {"metric": "lora_decode_tps_int4", "value": round(best, 2),
            "unit": "tok/s", "reference_lora_fp16": 24.72,
            "ratio": round(best / 24.72, 2),
            "note": "rank-16 LoRA over 5 layers, int4 base (reference "
                    "benchmark() 'lora' config)"}


def prefill32k():
    """32K-token prefill throughput (chunked prefill + Pallas flash attention
    against the quantized cache window)."""
    from phi_3_vision_mlx_tpu.engine.engine import generate_text

    lm, proc = _lm(quantize_cache=True)
    prompt = ("The lighthouse keeper wrote: " + "x" * 50) * 420
    prompt = prompt[: 32768 - 256]
    best = 0.0
    for _ in range(2):
        ptps, _ = generate_text(
            lm, proc, prompt, max_tokens=2, verbose=False, stream=False,
            mute=True, return_tps=True,
        )
        best = max(best, ptps)
    return {"metric": "prefill_tps_32k_quantized_window", "value": round(best, 2),
            "unit": "tok/s", "note": "chunked prefill, flash-attention kernel"}


def quant64k():
    """64K window: the packed int4 cache alone is ~8 GB (payload 6.4 +
    scales 1.6) and OOMs this fractional subslice's HBM alongside the 1.9 GB
    weights — 32K is the largest window demonstrated on the fraction; a full
    v5e fits 64K, and 128K (~16 GB cache) takes multi-chip KV head sharding
    (parallel/sharding.py).  Kept callable for bigger chips; not in the
    default run."""
    tps = _window_tps(65536, True, max_tokens=256)
    return {"metric": "decode_tps_quantized_cache_64k_window",
            "value": round(tps, 2), "unit": "tok/s"}


def _tiered_tps(window: int, max_tokens: int = 12, chunk: int = 8192,
                hot: int = 512):
    """Decode TPS with the tiered (pinned-host cold KV) cache at ``window``.

    Returns (tps, prefill_seconds, n_chunks).
    """
    from phi_3_vision_mlx_tpu.engine.tiered import TieredEngine

    lm, proc = _lm(quantize_cache=True)
    eng = TieredEngine(lm, chunk=chunk, hot=hot)
    prompt_tokens = window - hot  # pads round it up to `window - hot` cols
    prompt = ("The lighthouse keeper wrote: " + "x" * 50) * (
        prompt_tokens // 79 + 1
    )
    dict_input = proc(prompt[:prompt_tokens - 8])
    t0 = time.time()
    logits, state = eng.prefill(dict_input)
    prefill_s = time.time() - t0
    group = int(os.environ.get("PHI3V_TPU_TIERED_GROUP", "1"))
    if group > 1:  # merge cold chunks: fewer, larger PCIe transfers
        state = eng.consolidate(state, group)
    tok = int(np.argmax(logits[0]))
    # chunked decode (argmax feedback on device): the cold tier still
    # streams once per token — exact attention — but the host/tunnel round
    # trip amortizes over the chunk.  Warm/compile first.
    cs = int(os.environ.get("PHI3V_TPU_TIERED_CHUNK", "4"))
    toks, state = eng.decode_chunk(state, np.array([[tok]], np.int32), cs)
    tok = int(toks[-1, 0])
    # best of 3 timed windows: the shared tunnel/remote host shows heavy
    # run-to-run contention (the same code has measured 0.84 and 0.57
    # tok/s at 128K hours apart); contention only ever SLOWS a rep, so the
    # max is the honest machine-capability number.  All reps are returned
    # for the row's note.
    reps = []
    for _ in range(3):
        t0 = time.time()
        n = 0
        while n < max_tokens:
            toks, state = eng.decode_chunk(
                state, np.array([[tok]], np.int32), cs)
            tok = int(toks[-1, 0])
            n += cs
        reps.append(n / (time.time() - t0))
    return max(reps), prefill_s, len(state.cold_k), [round(r, 3) for r in reps]


def tiered64k():
    """64K window on ONE fractional chip via KV tiering (engine/tiered.py):
    cold prompt KV in pinned host memory streamed per layer (~14 GB/s PCIe),
    hot decode tail in HBM.  The in-HBM path OOMs at 64K on this ~8 GB
    fraction (quant48k is its ceiling); tiering makes 64K work — slow is
    expected (each token re-reads the full cold cache over PCIe; exact
    attention's floor), OOM is not."""
    tps, prefill_s, nc, reps = _tiered_tps(65536, max_tokens=12)
    g = int(os.environ.get("PHI3V_TPU_TIERED_GROUP", "1"))
    pf = os.environ.get("PHI3V_TPU_TIERED_PREFETCH", "1") != "0"
    return {"metric": "decode_tps_quantized_cache_64k_window_tiered",
            "prefetch": pf,
            **({"consolidate_group": g} if g > 1 else {}),
            "value": round(tps, 3), "unit": "tok/s", "reps": reps,
            "prefill_s": round(prefill_s, 1), "cold_chunks": nc,
            "note": "pinned-host cold KV, exact two-tier attention; "
                    "parity-tested vs in-HBM path (tests/test_tiered.py); "
                    "value = best of 3 reps (shared-tunnel contention)"}


def tiered128k():
    """The reference's headline 128K context on one chip (reference
    phi.py:528-540 serves it on a 64 GB Mac).  Cold tier ~16 GB pinned host;
    per-token cost = streaming it over PCIe."""
    tps, prefill_s, nc, reps = _tiered_tps(131072, max_tokens=8)
    g = int(os.environ.get("PHI3V_TPU_TIERED_GROUP", "1"))
    pf = os.environ.get("PHI3V_TPU_TIERED_PREFETCH", "1") != "0"
    return {"metric": "decode_tps_quantized_cache_128k_window_tiered",
            "prefetch": pf,
            **({"consolidate_group": g} if g > 1 else {}),
            "value": round(tps, 3), "unit": "tok/s", "reps": reps,
            "prefill_s": round(prefill_s, 1), "cold_chunks": nc,
            "note": "full reference-parity window on a fractional chip; "
                    "value = best of 3 reps (shared-tunnel contention)"}


def _tiered_spec_tps(window: int, max_tokens: int = 128, k_draft: int = 7,
                     n_iters: int = 4, chunk: int = 8192, hot: int = 512):
    """Tiered decode TPS with prompt-lookup speculation at the acceptance
    CEILING (lm_head scales zeroed -> constant argmax -> every draft
    accepts; same construction as spec()).  The tiered cost model is the
    cold-tier PCIe stream per attention pass, so K+1 accepted tokens per
    verify pass divide the dominant per-token cost by ~K+1.  The all-reject
    floor is the plain tiered row (1 token per stream).

    Returns (tps, prefill_s, n_chunks, tokens_emitted).
    """
    from bench import synth_quantized_params
    from phi_3_vision_mlx_tpu.core.config import QuantConfig, preset
    from phi_3_vision_mlx_tpu.engine.engine import LM
    from phi_3_vision_mlx_tpu.engine.speculative import init_token_buffer
    from phi_3_vision_mlx_tpu.engine.tiered import TieredEngine, _pad_to_chunks
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3Processor
    from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer

    cfg = preset("phi35_mini").replace(
        quantized=QuantConfig(
            group_size=64, bits=4, mode=os.environ["BENCH_QUANT_MODE"]
        ),
        use_quantized_cache=True,
    )
    params = synth_quantized_params(cfg, jax.random.PRNGKey(0))
    params["lm_head"]["scales"] = params["lm_head"]["scales"] * 0
    if jax.default_backend() == "tpu":
        from phi_3_vision_mlx_tpu.core.weights import kernelize_params

        params = kernelize_params(params, cfg)
    jax.block_until_ready(params)
    lm = LM(cfg, params)
    proc = Phi3Processor(tokenizer=ByteTokenizer())

    eng = TieredEngine(lm, chunk=chunk, hot=hot)
    prompt_tokens = window - hot
    prompt = ("The lighthouse keeper wrote: " + "x" * 50) * (
        prompt_tokens // 79 + 1
    )
    dict_input = proc(prompt[: prompt_tokens - 8])
    t0 = time.time()
    logits, state = eng.prefill(dict_input)
    prefill_s = time.time() - t0
    group = int(os.environ.get("PHI3V_TPU_TIERED_GROUP", "1"))
    if group > 1:
        state = eng.consolidate(state, group)
    tok = int(np.argmax(logits[0]))
    ids_p, _, _, _ = _pad_to_chunks(dict_input, eng.pc)
    # Warm with ONE real dispatch (AOT lower().compile() does NOT fill the
    # jit dispatch cache -- the first call would recompile remotely inside
    # the timed loop).  The warmup advances hot offset by <= n_iters*lq;
    # the hot window dwarfs that and the cold-stream cost is unchanged.
    buf_w = init_token_buffer(ids_p, state.window)
    eng.spec_decode(state, tok, buf_w, max_tokens=2, k_draft=k_draft,
                    n_iters=n_iters)
    # Best of 3 timed windows, same rationale as _tiered_tps: tunnel
    # contention only ever slows a rep, so max is the machine number.
    reps, n_out = [], 0
    for _ in range(3):
        buf = init_token_buffer(ids_p, state.window)
        t0 = time.time()
        out, state = eng.spec_decode(state, tok, buf, max_tokens,
                                     k_draft=k_draft, n_iters=n_iters)
        dt = time.time() - t0
        n_out = len(out) - 1
        reps.append(n_out / dt)
    return (max(reps), prefill_s, len(state.cold_k), n_out,
            [round(r, 3) for r in reps])


def _mid_tokens_per_pass():
    """Measured mid-envelope tokens/pass from the spec_mid row, if present."""
    if os.path.exists("BENCH_EXTRA.json"):
        for m in json.load(open("BENCH_EXTRA.json"))["measurements"]:
            if m["metric"] == "spec_mid_envelope_tokens_per_pass":
                return m["value"]
    return None


def tiered_spec64k():
    tps, prefill_s, nc, n, reps = _tiered_spec_tps(65536)
    mid = _mid_tokens_per_pass()
    return {"metric": "decode_tps_tiered_64k_spec_ceiling",
            "value": round(tps, 3), "unit": "tok/s", "reps": reps,
            "prefill_s": round(prefill_s, 1), "cold_chunks": nc,
            "tokens": n, "spec_k": 7,
            "pass_rate_per_s": round(tps / 8, 3),
            **({"projected_mid_tps": round(mid * tps / 8, 3),
                "mid_tokens_per_pass": mid} if mid else {}),
            "note": "prompt-lookup speculation over the tiered cache: K+1 "
                    "tokens share one cold-tier PCIe stream; ceiling = all "
                    "drafts accept (constant-argmax head); floor = the "
                    "tiered64k row; greedy-exact (tests/test_tiered.py); "
                    "projected_mid_tps = spec_mid tokens/pass x the "
                    "acceptance-independent pass rate (value/8)"}


def tiered_spec128k():
    tps, prefill_s, nc, n, reps = _tiered_spec_tps(131072, max_tokens=96)
    mid = _mid_tokens_per_pass()
    return {"metric": "decode_tps_tiered_128k_spec_ceiling",
            "value": round(tps, 3), "unit": "tok/s", "reps": reps,
            "prefill_s": round(prefill_s, 1), "cold_chunks": nc,
            "tokens": n, "spec_k": 7,
            "pass_rate_per_s": round(tps / 8, 3),
            **({"projected_mid_tps": round(mid * tps / 8, 3),
                "mid_tokens_per_pass": mid} if mid else {}),
            "note": "the 128K single-chip window with speculative "
                    "verification amortizing the PCIe stream; "
                    "projected_mid_tps = spec_mid tokens/pass x pass rate"}


def spec():
    """Prompt-lookup speculative decoding (engine/speculative.py).

    Synthetic random weights cannot *echo* (acceptance needs generation to
    repeat its context), so this measures the two ends of the envelope with
    identical weight/cache traffic:
    * overhead: the standard single-stream workload — non-repeating text,
      acceptance ~0, every weight pass verifies K+1 positions but emits 1
      token (worst case);
    * ceiling: lm_head weight scales zeroed so logits are the bias plane
      and greedy argmax is constant — the generation is a period-1 cycle,
      every draft accepts, and each weight pass emits K+1 tokens (the
      machinery's upper bound; all matmuls/attention/proposal still run).
    Real-text acceptance sits in between and is workload-dependent (echo /
    extraction / RAG-style generation approaches the ceiling).  The emitted
    stream is bit-identical to vanilla greedy in both cases
    (tests/test_speculative.py).
    """
    from phi_3_vision_mlx_tpu.engine.engine import generate_text

    prompt = (
        "Write a detailed mystery story set in a lighthouse on a remote "
        "island, where the keeper discovers a coded journal."
    )

    def run(lm, proc, spec_on):
        best, stats = 0.0, None
        for _ in range(3):
            _, tps = generate_text(
                lm, proc, prompt, max_tokens=512, verbose=False, stream=False,
                mute=True, return_tps=True, speculative=spec_on,
            )
            if tps > best:
                best, stats = tps, getattr(lm, "_spec_stats", None)
        return best, stats

    lm, proc = _lm()
    base_tps, _ = run(lm, proc, False)
    over_tps, over_stats = run(lm, proc, True)

    # ceiling workload: identical traffic, constant-argmax lm_head
    from bench import synth_quantized_params
    from phi_3_vision_mlx_tpu.core.config import QuantConfig, preset
    from phi_3_vision_mlx_tpu.engine.engine import LM
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3Processor
    from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer

    cfg = preset("phi35_mini").replace(
        quantized=QuantConfig(
            group_size=64, bits=4, mode=os.environ["BENCH_QUANT_MODE"]
        )
    )
    params = synth_quantized_params(cfg, jax.random.PRNGKey(0))
    head = params["lm_head"]
    head["scales"] = head["scales"] * 0
    if jax.default_backend() == "tpu":
        from phi_3_vision_mlx_tpu.core.weights import kernelize_params

        params = kernelize_params(params, cfg)
    jax.block_until_ready(params)
    lm2 = LM(cfg, params)
    proc2 = Phi3Processor(tokenizer=ByteTokenizer())
    ceil_base, _ = run(lm2, proc2, False)
    ceil_tps, ceil_stats = run(lm2, proc2, True)
    os.environ["PHI3V_TPU_SPEC_K"] = "15"  # lq=16, the kv-kernel bound
    try:
        ceil15_tps, _ = run(lm2, proc2, True)
    finally:
        os.environ.pop("PHI3V_TPU_SPEC_K", None)

    def accept(stats):
        if not stats or not stats.get("iters"):
            return None
        return round(stats["emitted"] / stats["iters"], 2)

    return {
        "metric": "spec_decode_tps_ceiling",
        "value": round(ceil_tps, 2),
        "unit": "tok/s",
        "vanilla_same_weights": round(ceil_base, 2),
        "speedup": round(ceil_tps / ceil_base, 2),
        "tokens_per_pass": accept(ceil_stats),
        "ceiling_k15_tps": round(ceil15_tps, 2),
        "overhead_workload_tps": round(over_tps, 2),
        "overhead_vanilla_tps": round(base_tps, 2),
        "overhead_tokens_per_pass": accept(over_stats),
        "note": "prompt-lookup speculative decode, greedy-exact; ceiling = "
                "constant-argmax lm_head (all drafts accept), overhead = "
                "non-repeating text (acceptance ~0)",
    }


def spec_mid():
    """Mid-envelope speculation: acceptance measured on a TRAINED model.

    The spec() envelope brackets acceptance with a rigged ceiling (echo
    head, 8 tok/pass) and a zero-acceptance overhead row, because random
    full-size weights cannot echo their context.  This row closes the gap:
    train the tiny induction LM from scratch (train/pretrain.py — repeated
    random phrases, so copying earlier context is the optimal policy),
    then measure prompt-lookup tokens/pass on HELD-OUT docs.  Drafts accept
    through phrase bodies and reject at phrase boundaries — a genuine
    mid-envelope acceptance, not a fixture.

    Full-size tok/s projection: a spec pass verifies K+1 positions whatever
    the acceptance, so pass rate is acceptance-independent; both envelope
    ends of spec() measure it independently and agree to ~1% (ceiling
    1202/8 = 150.3 passes/s vs overhead ~149).  projected_tps =
    tokens_per_pass x measured pass rate.  CPU twin:
    tests/test_pretrain_induction.py::test_induction_lm_mid_envelope.
    """
    from phi_3_vision_mlx_tpu.api import _load
    from phi_3_vision_mlx_tpu.train.pretrain import (
        induction_docs, measure_tokens_per_pass, train_induction_lm)

    scan = 16 if jax.default_backend() == "tpu" else 1
    t0 = time.time()
    _, losses = train_induction_lm(
        "/tmp/phi3v_induction_lm", steps=240, bs=8, seq_len=128, seed=0,
        scan_steps=scan,
    )
    train_s = time.time() - t0
    lm, proc = _load("/tmp/phi3v_induction_lm")
    rng = np.random.default_rng(99)  # held out: training drew from seed 1
    tpps = []
    for _ in range(5):
        doc = induction_docs(rng, 1, n_phrases=4, phrase_len=8,
                             phrases_per_doc=24)[0]
        tpp, _ = measure_tokens_per_pass((lm, proc), doc, max_tokens=96,
                                         spec_k=7)
        tpps.append(round(tpp, 2))
    mean_tpp = float(np.mean(tpps))

    # pass-rate projection from the measured full-size envelope rows
    row = {}
    if os.path.exists("BENCH_EXTRA.json"):
        for m in json.load(open("BENCH_EXTRA.json"))["measurements"]:
            if m["metric"] == "spec_decode_tps_ceiling" and \
                    m.get("quant_mode", "affine") == os.environ["BENCH_QUANT_MODE"]:
                row = m
    rates = []
    if row.get("tokens_per_pass"):
        rates.append(row["value"] / row["tokens_per_pass"])
    if row.get("overhead_tokens_per_pass"):
        rates.append(row["overhead_workload_tps"] / row["overhead_tokens_per_pass"])
    rate = float(np.mean(rates)) if rates else None

    return {
        "metric": "spec_mid_envelope_tokens_per_pass",
        "value": round(mean_tpp, 2),
        "unit": "tokens/pass (K=7, ceiling 8.0, floor 1.0)",
        "per_doc": tpps,
        "train_s": round(train_s, 1),
        "final_loss": round(losses[-1], 3),
        "projected_full_size_tps": round(mean_tpp * rate, 1) if rate else None,
        "pass_rate_per_s": round(rate, 1) if rate else None,
        "note": "trained induction LM, held-out docs; projection = "
                "tokens/pass x acceptance-independent pass rate (both "
                "spec() envelope ends measure the same rate, ~150/s)",
    }


def serve():
    """Continuous-batching serving throughput: 8 staggered requests over 4
    slots (requests join the running batch mid-decode)."""
    from phi_3_vision_mlx_tpu.engine.batching import BatchEngine

    lm, proc = _lm()
    slots = int(os.environ.get("BENCH_SLOT_COUNT", "8"))
    depth = int(os.environ.get("BENCH_SERVE_DEPTH", "2"))
    eng = BatchEngine(lm, proc, slots=slots, window=512,
                      pipeline_depth=depth)
    # warmup: compile prefill + adopt + step
    r0 = eng.submit("warmup request", max_tokens=8)
    while eng.pending():
        eng.step()

    # r3 chunk sweep (8 staggered reqs / 4 slots): 16 -> 235, 32 -> 284,
    # 64 -> 244 (mid-chunk finish waste), 128 -> 171 tok/s aggregate.
    chunk = int(os.environ.get("BENCH_SLOT_CHUNK", "32"))
    # warm the chunked step too
    r1 = eng.submit("warmup two", max_tokens=chunk + 2)
    while eng.pending():
        eng.step(chunk)

    # Pipelined chunks (default): dispatch chunk k+1 before collecting k,
    # hiding per-chunk dispatch+fetch latency (~80 ms through the tunnel).
    # BENCH_SERVE_PIPELINE=0 measures the old synchronous loop.
    pipelined = os.environ.get("BENCH_SERVE_PIPELINE", "1") != "0"

    # batched admission (r4): all simultaneously-free slots fill through ONE
    # prefill dispatch (engine.prepare_many), like the HTTP scheduler's
    # admission worker.  BENCH_SERVE_ADMIT_BATCH=0 restores per-request.
    admit_batched = os.environ.get("BENCH_SERVE_ADMIT_BATCH", "1") != "0"

    def one_rep():
        t0 = time.perf_counter()
        rids = []
        pending_submits = [
            (f"Request {i}: tell a story about topic {i}.", 128 + 32 * (i % 4))
            for i in range(2 * slots)
        ]
        steps = 0
        while pending_submits or eng.pending():
            # admit into EVERY free slot (one-per-chunk admission starves
            # slots)
            if pending_submits and eng.free:
                n_adm = min(len(pending_submits), len(eng.free))
                take, pending_submits = (pending_submits[:n_adm],
                                         pending_submits[n_adm:])
                if admit_batched and n_adm > 1:
                    prepared = eng.prepare_many(
                        [p for p, _ in take],
                        [dict(max_tokens=n) for _, n in take],
                    )
                    rids += [eng.admit(p) for p in prepared]
                else:
                    rids += [eng.submit(p, max_tokens=n) for p, n in take]
            if eng.pending():
                if pipelined:
                    eng.step_pipelined(chunk)
                else:
                    eng.step(chunk)
                steps += 1
        eng.flush()
        dt = time.perf_counter() - t0
        total = sum(len(eng.requests[r].tokens) for r in rids)
        return total / dt, total, dt, steps

    # Best of N reps (the repo-wide bench convention, cf. _decode_tps):
    # the tunnel's per-dispatch round trip swings ~10x between sessions
    # and within one, so a single rep conflates scheduler quality with
    # tunnel weather.  All rep values land in the note.
    reps = max(1, int(os.environ.get("BENCH_SERVE_REPS", "3")))
    runs = [one_rep() for _ in range(reps)]
    tps, total, dt, steps = max(runs, key=lambda r: r[0])
    return {
        "metric": "serving_aggregate_tps_continuous_batching",
        "value": round(tps, 2),
        "unit": "tok/s aggregate",
        "note": f"{2 * slots} staggered requests over {slots} slots, {total} tokens in "
                f"{dt:.1f}s ({steps} dispatches of {chunk}-step chunks, "
                f"pipelined={pipelined}, depth={depth}, "
                f"batched_admission={admit_batched}); best of {reps} reps "
                f"{[round(r[0], 1) for r in runs]} "
                f"(tunnel RTT varies ~10x between sessions)",
    }


def serve_steady():
    """Steady-state (saturated) serving throughput: the submit queue is
    refilled continuously for a fixed wall window, so the number excludes
    the start ramp and end drain that dominate the fixed-workload `serve`
    row (55% useful slot-steps there).  This is the sustained tok/s a
    saturated deployment sees."""
    from phi_3_vision_mlx_tpu.engine.batching import BatchEngine

    lm, proc = _lm()
    slots = int(os.environ.get("BENCH_SLOT_COUNT", "8"))
    chunk = int(os.environ.get("BENCH_SLOT_CHUNK", "32"))
    depth = int(os.environ.get("BENCH_SERVE_DEPTH", "2"))
    window_s = float(os.environ.get("BENCH_STEADY_SECONDS", "12"))
    eng = BatchEngine(lm, proc, slots=slots, window=512,
                      pipeline_depth=depth)
    r0 = eng.submit("warmup request", max_tokens=8)
    while eng.pending():
        eng.step()
    eng.submit("warm chunk", max_tokens=chunk + 2)
    while eng.pending():
        eng.step(chunk)

    i = 0

    def refill():
        nonlocal i
        while eng.free:
            n_adm = len(eng.free)
            prepared = eng.prepare_many(
                [f"Request {i + j}: tell a story about topic {i + j}."
                 for j in range(n_adm)],
                [dict(max_tokens=128 + 32 * ((i + j) % 4))
                 for j in range(n_adm)],
            )
            for pp in prepared:
                eng.admit(pp)
            i += n_adm

    refill()
    # ramp: let the pipe fill before the measured window opens
    for _ in range(depth + 1):
        eng.step_pipelined(chunk)
        refill()
    emitted = 0
    t0 = time.perf_counter()
    while (dt := time.perf_counter() - t0) < window_s:
        out = eng.step_pipelined(chunk)
        emitted += sum(len(v) for v in out.values())
        refill()
    dt = time.perf_counter() - t0
    eng.flush()  # drained tokens excluded: they finished outside the window
    return {
        "metric": "serving_steady_state_tps",
        "value": round(emitted / dt, 2),
        "unit": "tok/s aggregate",
        "note": f"saturated load: {slots} slots x {chunk}-step chunks, "
                f"depth {depth}, continuous admission for {window_s:.0f}s "
                f"({emitted} tokens collected in-window; ramp of "
                f"{depth + 1} chunks excluded)",
    }


def serve_spec():
    """Per-slot speculative decoding in the continuous-batching engine.

    Same bracketing as ``spec``: the ceiling model (constant-argmax
    lm_head) makes every slot's drafts accept, measuring the machinery's
    upper bound at serving batch sizes; vanilla slot decode on the same
    weights is the baseline.
    """
    import time as _t

    from bench import synth_quantized_params
    from phi_3_vision_mlx_tpu.core.config import QuantConfig, preset
    from phi_3_vision_mlx_tpu.engine.batching import BatchEngine
    from phi_3_vision_mlx_tpu.engine.engine import LM
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3Processor
    from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer

    cfg = preset("phi35_mini").replace(
        quantized=QuantConfig(
            group_size=64, bits=4, mode=os.environ["BENCH_QUANT_MODE"]
        )
    )
    params = synth_quantized_params(cfg, jax.random.PRNGKey(0))
    params["lm_head"]["scales"] = params["lm_head"]["scales"] * 0
    if jax.default_backend() == "tpu":
        from phi_3_vision_mlx_tpu.core.weights import kernelize_params

        params = kernelize_params(params, cfg)
    jax.block_until_ready(params)
    lm = LM(cfg, params)
    proc = Phi3Processor(tokenizer=ByteTokenizer())

    pipelined = os.environ.get("BENCH_SERVE_PIPELINE", "1") != "0"
    depth = int(os.environ.get("BENCH_SERVE_DEPTH", "2"))

    def run(spec_k, chunk):
        eng = BatchEngine(lm, proc, slots=4, window=512, spec_k=spec_k,
                          pipeline_depth=depth)
        r0 = eng.submit("warmup", max_tokens=8)
        while eng.pending():
            eng.step(chunk)
        rids = []
        submits = [
            (f"Request {i}: tell a story about topic {i}.", 128 + 32 * (i % 4))
            for i in range(8)
        ]
        t0 = _t.perf_counter()
        while submits or eng.pending():
            if submits and eng.free:
                prompt, n = submits.pop(0)
                rids.append(eng.submit(prompt, max_tokens=n))
            if eng.pending():
                if pipelined:
                    eng.step_pipelined(chunk)
                else:
                    eng.step(chunk)
        eng.flush()
        dt = _t.perf_counter() - t0
        total = sum(len(eng.requests[r].tokens) for r in rids)
        return total / dt, eng.spec_stats

    def run_mixed(spec_k, chunk):
        """Half the requests sample (rejection-verified drafts), half greedy."""
        eng = BatchEngine(lm, proc, slots=4, window=512, spec_k=spec_k,
                          seed=11, pipeline_depth=depth)
        r0 = eng.submit("warmup", max_tokens=8, temperature=0.8)
        while eng.pending():
            eng.step(chunk)
        rids = []
        submits = [
            (f"Request {i}: tell a story about topic {i}.", 128 + 32 * (i % 4),
             dict(temperature=0.8, top_p=0.95) if i % 2 else {})
            for i in range(8)
        ]
        t0 = _t.perf_counter()
        while submits or eng.pending():
            if submits and eng.free:
                prompt, n, kw = submits.pop(0)
                rids.append(eng.submit(prompt, max_tokens=n, **kw))
            if eng.pending():
                if pipelined:
                    eng.step_pipelined(chunk)
                else:
                    eng.step(chunk)
        eng.flush()
        dt = _t.perf_counter() - t0
        total = sum(len(eng.requests[r].tokens) for r in rids)
        return total / dt, eng.spec_stats

    base_tps, _ = run(0, 16)
    spec_tps, stats = run(7, 16)
    mixed_tps, mixed_stats = run_mixed(7, 16)
    per_pass = (
        round(stats["emitted"] / stats["passes"], 2) if stats["passes"] else None
    )
    mixed_per_pass = (
        round(mixed_stats["emitted"] / mixed_stats["passes"], 2)
        if mixed_stats["passes"] else None
    )
    return {
        "metric": "serving_spec_aggregate_tps_ceiling",
        "value": round(spec_tps, 2),
        "unit": "tok/s aggregate",
        "vanilla_same_weights": round(base_tps, 2),
        "speedup": round(spec_tps / base_tps, 2),
        "tokens_per_pass": per_pass,
        "mixed_greedy_sampled_tps": round(mixed_tps, 2),
        "mixed_tokens_per_pass": mixed_per_pass,
        "note": f"4 slots, 8 staggered requests, spec_k=7, ceiling model "
                f"(all drafts accept); mixed row = half the requests at "
                f"temperature 0.8 (rejection-verified drafts); real-text "
                f"acceptance is workload-dependent (pipelined={pipelined})",
    }


def chat():
    """Interactive serving profile: adaptive chunk ramp (8 -> 256), first-token
    latency + decode-chunk latency percentiles (utils.profiler.StepTimer)."""
    from phi_3_vision_mlx_tpu.engine.engine import generate_text
    from phi_3_vision_mlx_tpu.utils.timing import Tic

    os.environ["PHI3V_TPU_DECODE_CHUNK_MIN"] = "8"
    step_log = "/tmp/phi3v_chat_steps.json"
    os.environ["PHI3V_TPU_STEP_LOG"] = step_log
    try:
        lm, proc = _lm()
        prompt = "Tell me a story about a lighthouse keeper."
        # warmup compiles every ramp size
        generate_text(lm, proc, prompt, max_tokens=256, verbose=False,
                      stream=False, mute=True)
        tic = Tic()
        ptps, gtps = generate_text(
            lm, proc, prompt, max_tokens=256, verbose=False, stream=False,
            mute=True, return_tps=True,
        )
        steps = json.load(open(step_log))
        prompt_toks = len(proc(prompt)["input_ids"][0])
        first_token_ms = round(1e3 * prompt_toks / ptps, 1)
        return {
            "metric": "chat_latency",
            "value": first_token_ms,
            "unit": "ms to first token",
            "decode_tps": round(gtps, 2),
            "chunk_latency_ms": steps,
            "note": "adaptive decode chunks 8->256 (PHI3V_TPU_DECODE_CHUNK_MIN)",
        }
    finally:
        os.environ["PHI3V_TPU_DECODE_CHUNK_MIN"] = "256"
        os.environ.pop("PHI3V_TPU_STEP_LOG", None)


ALL = {
    "single": single, "batch15": batch15, "dense8k": dense8k,
    "quant8k": quant8k, "quant32k": quant32k, "quant48k": quant48k,
    "prefill32k": prefill32k, "vqa": vqa, "vqa_decode": vqa_decode,
    "vqa_decode_qcache": vqa_decode_qcache,
    "lora_decode": lora_decode, "chat": chat, "serve": serve,
    "serve_steady": serve_steady, "spec": spec, "spec_mid": spec_mid,
    "serve_spec": serve_spec,
}
# quant64k needs a full chip's HBM; the tiered rows run on the fraction but
# take ~10-30 min each (long prefill + per-token PCIe streaming), so they
# are recorded explicitly (python bench_extra.py tiered64k tiered128k)
# rather than in every default sweep.
EXTRA = {"quant64k": quant64k, "tiered64k": tiered64k,
         "tiered128k": tiered128k, "tiered_spec64k": tiered_spec64k,
         "tiered_spec128k": tiered_spec128k}
ALL_RUNNABLE = {**ALL, **EXTRA}


def main():
    names = sys.argv[1:] or list(ALL)
    path = "BENCH_EXTRA.json"
    doc = {"comment": "Side measurements (driver metric is bench.py).",
           "measurements": []}
    if os.path.exists(path):
        doc = json.load(open(path))
    key = lambda m: (m["metric"], m.get("quant_mode", "affine"))
    by_metric = {key(m): m for m in doc["measurements"]}
    for name in names:
        res = ALL_RUNNABLE[name]()
        res["quant_mode"] = os.environ["BENCH_QUANT_MODE"]
        print(json.dumps(res))
        by_metric[key(res)] = res
        doc["measurements"] = list(by_metric.values())
        with open(path, "w") as f:  # write after every workload: a later
            json.dump(doc, f, indent=2)  # crash must not drop earlier results


if __name__ == "__main__":
    main()
