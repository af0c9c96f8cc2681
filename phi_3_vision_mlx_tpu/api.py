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
import re
import subprocess
from io import BytesIO
from pathlib import Path
from urllib.parse import urlparse

import numpy as np

from .core import weights as W
from .core.config import ID_ASS, ID_EOS
from .engine.constrain import choose_from, constrain_decode
from .engine.engine import LM, generate_text
from .models.preprocess import Phi3Processor, Phi3VProcessor

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
            W.create_random_checkpoint(local, preset_name, **overrides)
            W.quantize_checkpoint(local, quant)


def _get_adapter_path(model_path: str) -> str:
    print(f"{PATH_ADAPTERS}/{Path(model_path).name}")
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
    proc_cls = Phi3VProcessor if cfg.architecture.startswith("Phi3V") else Phi3Processor
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


def _load_image(image_source):
    """BytesIO / URL / path -> PIL image (reference ``_load_image``, :307-326)."""
    from PIL import Image

    if isinstance(image_source, BytesIO):
        try:
            return Image.open(image_source)
        except IOError as e:
            raise ValueError(f"Failed to load image from BytesIO with error: {e}")
    if hasattr(image_source, "convert"):
        return image_source  # already a PIL image
    if isinstance(image_source, str) and image_source.startswith(("http://", "https://")):
        try:
            import requests

            response = requests.get(image_source, stream=True)
            response.raise_for_status()
            return Image.open(response.raw)
        except Exception as e:
            raise ValueError(
                f"Failed to load image from URL: {image_source} with error {e}"
            )
    if Path(image_source).is_file():
        try:
            return Image.open(image_source)
        except IOError as e:
            raise ValueError(f"Failed to load image {image_source} with error: {e}")
    raise ValueError(f"The image {image_source} must be a valid URL or existing file.")


def _load_text(file_path: str) -> str:
    """URL / file / literal -> text (reference ``_load_text``, :445-460)."""
    file_path = file_path.strip()
    parsed = urlparse(file_path)
    if parsed.scheme in ("http", "https"):
        import requests

        response = requests.get(file_path)
        if response.status_code != 200:
            raise Exception(
                f"Failed to retrieve URL: {file_path}, Status code: {response.status_code}"
            )
        return_text = response.text
    else:
        path = Path(file_path)
        return_text = path.read_text() if path.is_file() else file_path
    return return_text.replace('"', "'")


def _apply_chat_template(prompt, images, verbose, apply_chat_template=True):
    """Wrap prompt(s) in the Phi-3 chat format (reference :341-357)."""
    if apply_chat_template is False:
        if verbose:
            print(f"*** Prompt ***\n{prompt}\n*** Images ***\n{images}\n*** Output ***")
        return prompt, images
    if images is not None:
        images = (
            [_load_image(i) for i in images]
            if isinstance(images, list)
            else [_load_image(images)]
        )
        img_prompt = "\n".join(f"<|image_{i+1}|>" for i in range(len(images))) + "\n"
    else:
        img_prompt = ""
    prompt = [prompt] if isinstance(prompt, str) else prompt
    prompt = [f"<|user|>\n{img_prompt}{p.strip()}<|end|>\n<|assistant|>\n" for p in prompt]
    if verbose:
        prompt_str = "\n".join(map(str.strip, prompt)).strip()
        images_str = "\n".join(map(str, images)) if images else "None"
        print(f"*** Prompt ***\n{prompt_str}\n*** Images ***\n{images_str}\n*** Output ***")
    prompt = prompt[0] if len(prompt) == 1 else prompt
    return prompt, images


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
):
    """Greedy batched generation with streaming (reference :1324-1374)."""
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
# Code execution sandbox (reference ``execute``/``_execute``, :1489-1524,411)
# ---------------------------------------------------------------------------


def _get_api_output_path(process, file_prefix):
    if "<|api_output|>" in process.stdout:
        _api_output = process.stdout.strip().split("<|api_output|>", 1)[1]
        _from_path = Path(_api_output)
        if _from_path.is_file():
            _to_path = f"{file_prefix}_{_from_path.name}"
            _from_path.rename(_to_path)
            return _to_path
        return _api_output
    return None


def _execute(code_string, file_prefix=0):
    code_string = "\n".join(
        re.findall(r"```python\n(.*?)```", code_string, re.DOTALL)
    ).strip()
    if len(code_string) < 1:
        return None, None, None, None
    code_string = re.sub(r"plt\.savefig\(.*?\)", "plt.show()", code_string)
    plot_path = f"{file_prefix}.png" if "plt.show()" in code_string else None
    code_to_run = code_string.replace("plt.show()", f"plt.savefig('{plot_path}')")
    process = subprocess.run(
        ["python", "-c", code_to_run], capture_output=True, text=True
    )
    output_path = None
    stdout = process.stdout.strip()
    stderr = process.stderr.strip()
    if len(stderr) < 1:
        output_path = plot_path if plot_path else _get_api_output_path(process, file_prefix)
        stderr = None
    return code_string, output_path, stdout, stderr


def execute(code_strings, file_prefix=0, verbose=True):
    """Run ```python``` blocks in a subprocess sandbox, harvesting plots and
    ``<|api_output|>`` artifacts (reference ``execute``, :1489-1524)."""
    code_strings = [code_strings] if isinstance(code_strings, str) else code_strings
    results = [
        _execute(code, f"{file_prefix}_{i}") for i, code in enumerate(code_strings)
    ]
    if verbose is True:
        print("*** Execution ***")
        for result in results:
            for r in result:
                print(r)
    return {
        k: [r[i] for r in results]
        for i, k in enumerate(["codes", "files", "souts", "serrs"])
    }
