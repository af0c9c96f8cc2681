"""Runnable demos — the de-facto functional spec (reference examples.py).

Covers the same surface as the reference's example script: chat-templated
and raw generation, batched generation, constrained decoding (greedy + beam),
single-token choice, LoRA train/test, agent flows with toolchain hot-swap,
in-context learning with external text, RAG, and the benchmark harness.

Offline note: with no HuggingFace access, set PHI3V_TPU_ALLOW_RANDOM=1 to
run every flow against random-weight checkpoints (mechanics identical,
outputs meaningless).
"""

import os

os.environ.setdefault("PHI3V_TPU_ALLOW_RANDOM", "1")

import phi_3_vision_mlx_tpu as pv


def demo_generate():
    # visual question answering (vision model) or plain text (blind model)
    pv.generate("Explain the spectrum of a black body.", blind_model=True, max_tokens=64)
    # custom / no chat template
    pv.generate(
        "<|user|>\nWrite a haiku about autumn.<|end|>\n<|assistant|>\n",
        apply_chat_template=False,
        blind_model=True,
        max_tokens=48,
    )
    # batched generation
    pv.generate(
        ["Explain the TPU.", "Write a limerick about JAX."],
        blind_model=True,
        max_tokens=48,
    )
    # prompt-lookup speculative decoding: bit-identical greedy output,
    # up to K+1 tokens per weight pass on echo-heavy prompts
    pv.generate(
        "Summarize: the lighthouse keeper kept the light. The lighthouse "
        "keeper kept the light burning all night.",
        blind_model=True,
        max_tokens=48,
        speculative=True,
    )
    # seeded on-device sampling: temperature + nucleus/top-k/min-p filters
    pv.generate(
        "Brainstorm three names for a sailboat.",
        blind_model=True,
        max_tokens=48,
        sample=True,
        temperature=0.8,
        top_p=0.95,
        top_k=40,
        min_p=0.02,
        seed=7,
    )
    # stop sequences: halt + trim at the first occurrence (text-matched,
    # so stops spanning token boundaries fire)
    pv.generate(
        "List the planets, one per line.",
        blind_model=True,
        max_tokens=64,
        stop=["\n\n", "###"],
    )


def demo_constrain():
    prompt = (
        "A 20-year-old woman has swelling of her leg. Her blood pressure is "
        "normal. What is the most appropriate next step? A: Ultrasound B: CT "
        "C: MRI D: Aspirin E: Warfarin"
    )
    # structured generation: think, then answer in a fixed format
    pv.constrain(
        prompt,
        constraints=[(30, " The correct answer is"), "ABCDE"],
        blind_model=True,
    )
    # beam-variant constrained decoding
    pv.constrain(
        prompt,
        constraints=[(0, "\nThe"), (60, " The correct answer is"), "ABCDE"],
        blind_model=True,
        use_beam=True,
    )


def demo_choose():
    pv.choose(
        "What is the capital of France? A: London B: Berlin C: Paris",
        choices="ABC",
        blind_model=True,
    )


def demo_lora():
    pv.train_lora(
        lora_layers=2,
        lora_rank=4,
        epochs=2,
        take=4,
        batch_size=2,
        lr=1e-4,
        warmup=0.5,
        dataset_path="synthetic",
    )
    pv.test_lora(take=(0, 4), dataset_path="synthetic")


def demo_agent():
    # multi-turn VQA / code-feedback loop with the default toolchain
    agent = pv.Agent(blind_model=True)
    agent("Write a Python function that plots a sine wave to sine.png.")
    agent.end()

    # toolchain hot-swap: retrieval-augmented generation
    agent.set_toolchain(
        """
        prompt = rag(prompt)
        responses = generate(prompt, images)
        """
    )
    agent("How do I sort a dataframe by column?")
    agent.end()


def demo_icl():
    # in-context learning from an external document (@-syntax)
    from phi_3_vision_mlx_tpu.agent.tools import add_text

    prompt = add_text("What does this text say about TPUs? @ README.md")
    pv.generate(prompt, blind_model=True, max_tokens=48)


def demo_benchmark():
    # train_first fits the 1-sample LoRA for every model dir, as the
    # reference benchmark does (its lora config loads those adapters)
    pv.benchmark(blind_model=True, train_first=True, max_tokens=32,
                 dataset_path="synthetic")


def demo_continuous_batching():
    # production serving: requests join/leave a fixed slot pool independently
    from phi_3_vision_mlx_tpu.api import load
    from phi_3_vision_mlx_tpu.engine.batching import BatchEngine

    lm, proc = load(blind_model=True)
    eng = BatchEngine(lm, proc, slots=2, window=256)
    first = eng.submit("Tell me about lighthouses.", max_tokens=24)
    for _ in range(5):
        eng.step()
    second = eng.submit("And about TPUs?", max_tokens=24)  # joins mid-decode
    while eng.pending():
        eng.step()
    print(eng.result(first))
    print(eng.result(second))


if __name__ == "__main__":
    demo_generate()
    demo_choose()
    demo_constrain()
    demo_lora()
    demo_agent()
    demo_icl()
    demo_benchmark()
    demo_continuous_batching()
