"""GTE embedder: npz weight-mapping round-trip, forward, VDB, loud fallback."""

import numpy as np
import jax
import jax.numpy as jnp

from phi_3_vision_mlx_tpu.models import gte as G

CFG = G.GteConfig(dim=32, num_attention_heads=4, num_hidden_layers=2,
                  vocab_size=64, max_position_embeddings=16)


def test_npz_mapping_roundtrip(tmp_path):
    """save (MLX flat naming, (out,in) Linear layout) -> load == identity."""
    params = G.init_gte_params(CFG, jax.random.PRNGKey(0))
    path = str(tmp_path / "model.npz")
    G.save_gte_npz(params, CFG, path)
    loaded = G.load_gte_npz(path, CFG)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        params,
        loaded,
    )


def test_npz_mapping_rejects_missing_keys(tmp_path):
    params = G.init_gte_params(CFG, jax.random.PRNGKey(0))
    path = str(tmp_path / "model.npz")
    G.save_gte_npz(params, CFG, path)
    raw = dict(np.load(path))
    del raw["encoder.layers.1.attention.query_proj.weight"]
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, **raw)
    try:
        G.load_gte_npz(bad, CFG)
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_forward_masked_positions_do_not_leak():
    """Padding keys must not affect the pooled embedding of valid tokens."""
    params = G.init_gte_params(CFG, jax.random.PRNGKey(1))
    ids = jnp.array([[1, 2, 3, 0, 0]], jnp.int32)
    types = jnp.zeros_like(ids)
    mask = jnp.array([[1, 1, 1, 0, 0]], jnp.int32)
    h1 = G.gte_forward(params, CFG, ids, types, mask)
    ids2 = ids.at[0, 3:].set(9)  # change pad content
    h2 = G.gte_forward(params, CFG, ids2, types, mask)
    e1 = G.average_pool(h1, mask)
    e2 = G.average_pool(h2, mask)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_gtemodel_end_to_end_with_synthetic_checkpoint(tmp_path):
    """Full GteModel path against a generated checkpoint dir + stub tokenizer."""
    import json

    params = G.init_gte_params(CFG, jax.random.PRNGKey(2))
    mdir = tmp_path / "gte"
    mdir.mkdir()
    G.save_gte_npz(params, CFG, str(mdir / "model.npz"))
    (mdir / "config.json").write_text(json.dumps({
        "dim": CFG.dim, "num_attention_heads": CFG.num_attention_heads,
        "num_hidden_layers": CFG.num_hidden_layers, "vocab_size": CFG.vocab_size,
        "max_position_embeddings": CFG.max_position_embeddings,
        "attention_probs_dropout_prob": 0.1,
    }))

    class StubTok:
        def __call__(self, texts, **kw):
            ids = np.zeros((len(texts), 4), np.int64)
            for i, t in enumerate(texts):
                for j, c in enumerate(t[:4]):
                    ids[i, j] = (ord(c) % 60) + 2
            return {
                "input_ids": ids,
                "token_type_ids": np.zeros_like(ids),
                "attention_mask": (ids != 0).astype(np.int64),
            }

    model = G.GteModel(str(mdir), tokenizer=StubTok())
    emb = model(["hello", "world"])
    assert emb.shape == (2, CFG.dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)


def test_default_embedder_reports_fallback(capsys):
    emb = G.default_embedder(model_path="/nonexistent/gte")
    assert isinstance(emb, G.HashEmbedder)
    assert "lexical-hash fallback" in capsys.readouterr().err
