"""External inference-API tools (reference /root/reference/api.py).

``mistral_api`` — chat against a hosted LLM via the HF InferenceClient with
a manual ``[INST]`` history; ``bark_api`` — TTS writing ``bark.flac``.
Both require network access; they raise a clear error offline.
"""

from __future__ import annotations

_history = []


def mistral_api(prompt: str, history=None, verbose: bool = True):
    """Hosted-LLM chat tool (reference api.py:6-34)."""
    global _history
    history = _history if history is None else history
    try:
        from huggingface_hub import InferenceClient

        client = InferenceClient("mistralai/Mistral-7B-Instruct-v0.3")
        text = "<s>"
        for user, assistant in history:
            text += f"[INST] {user} [/INST]{assistant}</s>"
        text += f"[INST] {prompt} [/INST]"
        response = client.text_generation(
            text, max_new_tokens=1024, stream=False, details=False
        )
        result = response.strip()
    except Exception as e:
        raise RuntimeError(
            f"mistral_api requires network access to huggingface.co ({e})"
        ) from e
    history.append((prompt, result))
    _history = history
    if verbose:
        print(f"< mistral_api >\n{result}")
    return {"responses": result, "history": history}


def bark_api(prompt: str, verbose: bool = True):
    """Text-to-speech tool writing ``bark.flac`` (reference api.py:36-46)."""
    try:
        from huggingface_hub import InferenceClient

        client = InferenceClient("suno/bark-small")
        audio = client.text_to_speech(prompt)
        with open("bark.flac", "wb") as f:
            f.write(audio)
    except Exception as e:
        raise RuntimeError(
            f"bark_api requires network access to huggingface.co ({e})"
        ) from e
    if verbose:
        print("audio saved to bark.flac")
    return {"files": ["bark.flac"]}
