"""phi_3_vision_mlx_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with
the capabilities of JosefAlbers/Phi-3-Vision-MLX.

Public surface parity with the reference package (import it as ``pv`` like
the reference README does):

    import phi_3_vision_mlx_tpu as pv
    pv.generate("What is shown in this image?", images=[...])
    pv.train_lora(...); pv.test_lora(...); pv.benchmark()
    agent = pv.Agent(); agent("Plot sine wave.")

Layer map (SURVEY.md §1): core/ (config, weights, registry) -> models/
(phi3, vision, processors, gte) -> ops/ (rope, attention, quant, Pallas
kernels) -> engine/ (DecodeState, generate, constrain) -> train/ (LoRA) ->
parallel/ (mesh, shardings) -> agent/ + serve/ (toolchain, server, UI).
"""

__version__ = "0.1.0"

_LAZY = {
    # task API (reference phi_3_vision_mlx.py L4)
    "load": ".api",
    "generate": ".api",
    "choose": ".api",
    "constrain": ".api",
    "execute": ".api",
    "_setup": ".api",
    "_load": ".api",
    "_apply_chat_template": ".api",
    "_load_image": ".api",
    "_load_text": ".api",
    "PATH_ADAPTERS": ".api",
    "PATH_ORIGINAL_PHI3_VISION": ".api",
    "PATH_QUANTIZED_PHI3_VISION": ".api",
    "PATH_ORIGINAL_PHI3_BLIND": ".api",
    "PATH_QUANTIZED_PHI3_BLIND": ".api",
    # training
    "train_lora": ".train.trainer",
    "test_lora": ".train.trainer",
    "TrainingCallback": ".train.trainer",
    # benchmark
    "benchmark": ".bench",
    # agent / tools
    "Agent": ".agent.agent",
    "add_code": ".agent.tools",
    "add_text": ".agent.tools",
    "rag": ".agent.tools",
    "get_api": ".agent.tools",
    "mistral_api": ".agent.external",
    "bark_api": ".agent.external",
    # embeddings / RAG
    "GteModel": ".models.gte",
    "VDB": ".models.gte",
    # serving / UI
    "chat_ui": ".serve.ui",
    "BatchEngine": ".engine.batching",
    "PagedBatchEngine": ".engine.paging",
    "ContinuousScheduler": ".serve.server",
    # config/presets for programmatic use
    "ModelConfig": ".core.config",
    "preset": ".core.config",
    "ID_EOS": ".core.config",
    "ID_ASS": ".core.config",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
