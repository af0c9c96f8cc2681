"""Public task API — parity surface with the reference's L4
(/root/reference/phi_3_vision_mlx.py: load:1279 generate:1324 choose:1376
constrain:1425 execute:1489, plus the chat-template/image/text loaders).

``load()`` returns ``(LM, processor)`` — the same shape of preload tuple the
reference passes around, so downstream code (Agent, server, benchmark,
train/test_lora) composes identically.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from .agent.sandbox import execute as sandbox_execute
from .core import weights as W
from .core.registry import processor_for
from .engine.constrain import choose_from, constrain_decode
from .engine.engine import LM, generate_text
from .utils.media import fetch_image, fetch_text

PATH_ADAPTERS = "adapters"
PATH_ORIGINAL_PHI3_VISION = "models/phi3_v"
PATH_QUANTIZED_PHI3_VISION = "models/phi3_v_Q"
PATH_ORIGINAL_PHI3_BLIND = "models/phi3_mini_128k"
PATH_QUANTIZED_PHI3_BLIND = "models/phi3_mini_128k_Q"

HUB_VISION = "microsoft/Phi-3.5-vision-instruct"
HUB_BLIND = "microsoft/Phi-3.5-mini-instruct"


# ---------------------------------------------------------------------------
# Setup / load
# ---------------------------------------------------------------------------


def _setup(allow_random: bool = None):
    """Fetch + convert both checkpoints (reference ``_setup``, :247-255).

    Without network access (``huggingface.co`` unreachable), set
    ``PHI3V_TPU_ALLOW_RANDOM=1`` to materialize random-weight checkpoints of
    the real architecture instead — every flow then runs end-to-end offline
    (tests, benchmarks); generated text is of course meaningless.
    """
    if allow_random is None:
        allow_random = os.environ.get("PHI3V_TPU_ALLOW_RANDOM", "") == "1"
    pairs = [
        (HUB_BLIND, PATH_ORIGINAL_PHI3_BLIND, PATH_QUANTIZED_PHI3_BLIND, "phi35_mini"),
        (HUB_VISION, PATH_ORIGINAL_PHI3_VISION, PATH_QUANTIZED_PHI3_VISION, "phi35_vision"),
    ]
    for hub, local, quant, preset_name in pairs:
        if os.path.exists(local) and os.path.exists(quant):
            continue
        try:
            W.download_and_convert(hub, local, quant)
        except Exception as e:
            if not allow_random:
                raise RuntimeError(
                    f"Could not download {hub} ({type(e).__name__}: {e}). "
                    "Set PHI3V_TPU_ALLOW_RANDOM=1 to create random-weight "
                    "checkpoints for offline testing."
                ) from e
            n_layers = int(os.environ.get("PHI3V_TPU_RANDOM_LAYERS", "0")) or None
            overrides = {"num_hidden_layers": n_layers} if n_layers else {}
            # Arbitrary shrink for smoke runs on weak hosts, e.g.
            # PHI3V_TPU_RANDOM_OVERRIDES='{"hidden_size":256,"intermediate_size":512,
            # "num_attention_heads":8,"num_key_value_heads":8}'
            extra = os.environ.get("PHI3V_TPU_RANDOM_OVERRIDES")
            if extra:
                overrides.update(json.loads(extra))
            W.create_random_checkpoint(local, preset_name, **overrides)
            W.quantize_checkpoint(local, quant)


def _get_adapter_path(model_path: str) -> str:
    return f"{PATH_ADAPTERS}/{Path(model_path).name}"


def _load(model_path=PATH_ORIGINAL_PHI3_VISION, adapter_path=None, **kwargs):
    """Checkpoint dir -> (LM, processor) (reference ``_load``, :257-274)."""
    cfg, params = W.load_params(model_path, **kwargs)
    import jax

    if (
        jax.default_backend() == "tpu"
        and os.environ.get("PHI3V_TPU_QUANT_KERNEL", "1") == "1"
    ):
        params = W.kernelize_params(params, cfg)
    if adapter_path:
        lora_cfg = json.load(open(f"{adapter_path}/adapter_config.json"))
        if lora_cfg.get("model_path") and lora_cfg["model_path"] != model_path:
            print(
                f"WARNING: LoRA trained for {lora_cfg['model_path']} is being "
                f"used with {model_path}"
            )
        params = W.load_adapter(params, cfg, adapter_path)
    proc_cls = processor_for(cfg.architecture)
    processor = proc_cls(model_path)
    return LM(cfg, params, model_path=model_path), processor


def load(
    blind_model: bool = False,
    quantize_model: bool = False,
    quantize_cache: bool = False,
    use_adapter: bool = False,
    **kwargs,
):
    """Flag-based model selection (reference ``load``, :1279-1322)."""
    if blind_model:
        model_path = PATH_QUANTIZED_PHI3_BLIND if quantize_model else PATH_ORIGINAL_PHI3_BLIND
    else:
        model_path = PATH_QUANTIZED_PHI3_VISION if quantize_model else PATH_ORIGINAL_PHI3_VISION
    adapter_path = _get_adapter_path(model_path) if use_adapter else None
    if not os.path.exists(model_path):
        _setup()
    return _load(
        model_path=model_path,
        use_quantized_cache=quantize_cache,
        adapter_path=adapter_path,
        **kwargs,
    )


# ---------------------------------------------------------------------------
# Prompt / media helpers
# ---------------------------------------------------------------------------

# Media fetchers live in utils.media; aliases keep the reference-shaped names
# that toolchains may address by string.
_load_image = fetch_image
_load_text = fetch_text

CHAT_TURN = "<|user|>\n{body}<|end|>\n<|assistant|>\n"


def _image_tags(n: int) -> str:
    """``<|image_1|>..<|image_n|>`` header lines (reference :349-351)."""
    return "".join(f"<|image_{i}|>\n" for i in range(1, n + 1))


def _print_io_banner(prompt, images) -> None:
    if isinstance(prompt, list):
        prompt = "\n".join(map(str.strip, prompt)).strip()
    images_str = "\n".join(map(str, images)) if images else "None"
    print(f"*** Prompt ***\n{prompt}\n*** Images ***\n{images_str}\n*** Output ***")


def _apply_chat_template(prompt, images, verbose, apply_chat_template=True):
    """Wrap prompt(s) in the Phi-3 chat format and decode image sources.

    Parity surface: reference ``_apply_chat_template`` (:341-357) — the chat
    markup strings are the model's trained format and must match exactly.
    """
    if apply_chat_template is False:
        if verbose:
            _print_io_banner(prompt, images)
        return prompt, images
    if images is not None:
        sources = images if isinstance(images, list) else [images]
        images = [fetch_image(src) for src in sources]
    header = _image_tags(len(images)) if images else ""
    prompts = [prompt] if isinstance(prompt, str) else prompt
    prompts = [CHAT_TURN.format(body=f"{header}{p.strip()}") for p in prompts]
    if verbose:
        _print_io_banner(prompts, images)
    return (prompts[0] if len(prompts) == 1 else prompts), images


# ---------------------------------------------------------------------------
# Task API
# ---------------------------------------------------------------------------


def generate(
    prompt,
    images=None,
    preload=None,
    blind_model=False,
    quantize_model=False,
    quantize_cache=False,
    use_adapter=False,
    max_tokens=512,
    verbose=True,
    return_tps=False,
    early_stop=False,
    stream=True,
    apply_chat_template=True,
    enable_api=False,
    mute=False,
    sample=False,
    temperature=1.0,
    top_p=1.0,
    top_k=0,
    min_p=0.0,
    seed=0,
    speculative=None,
    stop=None,
):
    """Batched generation with streaming (reference :1324-1374).

    Greedy by default (reference parity); ``sample=True`` enables on-device
    temperature / nucleus / top-k / min-p sampling (``temperature``,
    ``top_p``, ``top_k``, ``min_p``, ``seed``).  ``stop``: string or list of
    strings — generation halts when one appears in the decoded text (matched
    on text, so stop strings spanning token boundaries fire) and the
    returned text is trimmed at the first occurrence; with ``stream=True``
    the printed stream withholds the longest-possible stop suffix so the
    console output equals the trimmed return value.
    ``speculative=True`` (or env ``PHI3V_TPU_SPEC=1``) enables prompt-lookup
    speculative decoding — single-stream only; greedy output is
    bit-identical, sampled output is distribution-exact via
    rejection-sampled verification (engine/speculative.py)."""
    if isinstance(prompt, str) and "<|api_input|>" in prompt and enable_api:
        from .agent.tools import get_api

        return get_api(prompt)
    if preload is None:
        preload = load(
            blind_model=blind_model,
            quantize_model=quantize_model,
            quantize_cache=quantize_cache,
            use_adapter=use_adapter,
        )
    prompt, images = _apply_chat_template(prompt, images, verbose, apply_chat_template)
    return generate_text(
        *preload,
        prompt,
        images=images,
        max_tokens=max_tokens,
        verbose=verbose,
        return_tps=return_tps,
        early_stop=early_stop,
        stream=stream,
        mute=mute,
        sample=sample,
        temperature=temperature,
        top_p=top_p,
        top_k=top_k,
        min_p=min_p,
        seed=seed,
        speculative=speculative,
        stop=stop,
    )


def choose(
    prompt,
    choices="ABCDE",
    images=None,
    preload=None,
    blind_model=False,
    quantize_model=False,
    quantize_cache=False,
    use_adapter=False,
    verbose=True,
    apply_chat_template=True,
):
    """Single-token option selection (reference ``choose``, :1376-1423)."""
    if preload is None:
        preload = load(
            blind_model=blind_model,
            quantize_model=quantize_model,
            quantize_cache=quantize_cache,
            use_adapter=use_adapter,
        )
    if apply_chat_template:
        prompt, _ = _apply_chat_template(prompt, images, verbose)
    return choose_from(*preload, prompt=prompt, choices=choices)


def constrain(
    prompt,
    constraints=[(0, "\nThe"), (100, " The correct answer is"), "ABCDE"],
    images=None,
    preload=None,
    blind_model=False,
    quantize_model=False,
    quantize_cache=False,
    use_adapter=False,
    verbose=True,
    apply_chat_template=True,
    use_beam=False,
):
    """Constrained decoding (reference ``constrain``, :1425-1487)."""
    if preload is None:
        preload = load(
            blind_model=blind_model,
            quantize_model=quantize_model,
            quantize_cache=quantize_cache,
            use_adapter=use_adapter,
        )
    if apply_chat_template:
        prompt = _apply_chat_template(prompt, None, verbose)[0]
    return constrain_decode(
        *preload, prompt=prompt, constraints=constraints, use_beam=use_beam, verbose=verbose
    )


# ---------------------------------------------------------------------------
# Code execution sandbox — implementation in agent/sandbox.py
# ---------------------------------------------------------------------------

execute = sandbox_execute
