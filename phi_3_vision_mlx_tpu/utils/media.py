"""Media/IO helpers: fetch images and text from heterogeneous sources.

Capability parity with the reference's loaders
(/root/reference/phi_3_vision_mlx.py: ``_load_image`` :307-326,
``_load_text`` :445-460) with this codebase's own structure: a resolver
chain per media type, one error wrapper.
"""

from __future__ import annotations

from io import BytesIO
from pathlib import Path
from urllib.parse import urlparse


def is_url(s) -> bool:
    return isinstance(s, str) and urlparse(s).scheme in ("http", "https")


def _http_get(url: str, **kw):
    import requests

    return requests.get(url, **kw)


def fetch_image(source):
    """PIL image | BytesIO | URL | file path -> decoded PIL image."""
    if hasattr(source, "convert"):
        return source  # already a decoded PIL image
    from PIL import Image

    try:
        if isinstance(source, BytesIO):
            return Image.open(source)
        if is_url(source):
            response = _http_get(source, stream=True)
            response.raise_for_status()
            return Image.open(response.raw)
        if isinstance(source, (str, Path)) and Path(source).is_file():
            return Image.open(source)
    except Exception as e:
        raise ValueError(f"Failed to load image from {source!r}: {e}") from e
    raise ValueError(f"The image {source} must be a valid URL or existing file.")


def fetch_text(source: str) -> str:
    """URL -> response body; file path -> contents; anything else -> itself.

    Double quotes fold to single quotes so fetched context can be embedded in
    quoted toolchain prompts (the agent's ``"..."`` -> ``<|api_input|>``
    rewriting would otherwise split on them).
    """
    source = source.strip()
    if is_url(source):
        response = _http_get(source)
        if response.status_code != 200:
            raise RuntimeError(
                f"Failed to retrieve URL: {source}, Status code: {response.status_code}"
            )
        text = response.text
    else:
        path = Path(source)
        text = path.read_text() if path.is_file() else source
    return text.replace('"', "'")
