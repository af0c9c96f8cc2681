"""Toolchain tools: code feedback, context loading, RAG, API retrieval.

Behavioral parity with the reference tools
(/root/reference/phi_3_vision_mlx.py: add_code:621 add_text:641 rag:685
get_api:735; execute lives in api.py).
"""

from __future__ import annotations

from typing import List

from ..models.gte import VDB


def add_code(prompt, codes):
    """Append previous-step code blocks to the prompt (feedback loop)."""
    if codes is None:
        return prompt
    return [f"{prompt}\n\n```python\n{code}\n```\n" for code in codes]


def add_text(prompt):
    """``question @ url-or-file`` -> prepend the fetched text as context."""
    from ..utils.media import fetch_text as _load_text

    was_str = isinstance(prompt, str)
    prompts = [prompt] if was_str else prompt
    pairs = [p.split("@") for p in prompts]
    result = [
        f"{_load_text(context.strip())}\n<|end|>\n<|user|>\n{question.strip()}"
        for question, context in pairs
    ]
    return result[0] if was_str else result


def rag(prompt, repo_id: str = "JosefAlbers/sharegpt_python_mlx", n_topk: int = 1):
    """Retrieve top-k contexts from a vector DB over a dataset and prepend."""
    was_str = isinstance(prompt, str)
    prompts = [prompt] if was_str else prompt
    try:
        import datasets

        ds = datasets.load_dataset(repo_id, split="train")
        vdb = VDB(ds)
    except Exception:
        # Offline: build the store from the built-in snippets so the flow
        # still functions (lexical retrieval via the hashing embedder).
        vdb = VDB()
    context = vdb(prompts, n_topk)
    result = [
        "\n<|end|>\n".join(context[i][:n_topk])
        + f"\n<|end|>\n<|user|>\n{prompts[i]}"
        for i in range(len(prompts))
    ]
    return result[0] if was_str else result


def get_api(prompt, n_topk: int = 1, verbose: bool = True) -> List[str]:
    """Similarity-route a prompt to a built-in API snippet and format it with
    the text after ``<|api_input|>`` (reference :735-783)."""
    prompts = [prompt] if isinstance(prompt, str) else prompt
    vdb = VDB()
    codes = vdb([p.split("<|api_input|>")[0] for p in prompts])
    codes = [
        code.format(prompt=prompts[i].split("<|api_input|>")[1].strip())
        for i, sublist in enumerate(codes)
        for code in sublist
    ]
    if verbose:
        print("*** Obtained API Codes ***")
        for code in codes:
            print(code)
    return codes
