"""Full-param pretraining (train/pretrain.py) + the induction mid-envelope.

SURVEY §4 strategy: hermetic tiny configs, deterministic seeds.  The slow
test is the CPU twin of bench_extra.spec_mid_envelope — it trains the tiny
induction LM from scratch and asserts prompt-lookup acceptance lands
STRICTLY BETWEEN the floor (1 token/pass) and the ceiling (K+1 tokens/pass):
a defensible mid-envelope, not a rigged echo model.
"""

import numpy as np
import pytest

from phi_3_vision_mlx_tpu.train.pretrain import (
    INDUCTION_VOCAB,
    encode_docs,
    induction_batches,
    induction_docs,
    make_clm_loss,
    measure_tokens_per_pass,
    pretrain,
    train_induction_lm,
)


def test_induction_corpus_shapes_and_determinism():
    rng = np.random.default_rng(3)
    docs = induction_docs(rng, 4, n_phrases=3, phrase_len=5, phrases_per_doc=6)
    assert len(docs) == 4
    for d in docs:
        words = d.split(" ")
        assert len(words) == 6
        assert len(set(words)) <= 3  # phrases repeat
        assert all(len(w) == 5 for w in words)
    ids, valid = encode_docs(docs, 48)
    assert ids.shape == (4, 48) and valid.shape == (4, 48)
    assert ids.max() < INDUCTION_VOCAB
    b1 = induction_batches(7, 2, 2, 32)
    b2 = induction_batches(7, 2, 2, 32)
    assert all(np.array_equal(x[0], y[0]) for x, y in zip(b1, b2))


def test_pretrain_loss_decreases():
    import jax

    from phi_3_vision_mlx_tpu.core.config import preset
    from phi_3_vision_mlx_tpu.models import phi3

    cfg = preset(
        "tiny",
        vocab_size=INDUCTION_VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_attention_heads=2,
        num_key_value_heads=2,
    )
    params = phi3.init_params(cfg, jax.random.PRNGKey(0))
    batches = induction_batches(1, 4, 4, 64)
    params, losses = pretrain(cfg, params, batches, lr=2e-3, warmup=4, steps=16)
    assert losses[-1] < losses[0]
    # trained params flow back through the loss (donation kept them usable)
    lf = make_clm_loss(cfg)
    ids, valid = batches[0]
    v = float(lf(params, ids, valid))
    assert np.isfinite(v)


@pytest.mark.slow
def test_induction_lm_mid_envelope(tmp_path):
    """Train from scratch; measure genuine mid-envelope spec acceptance."""
    from phi_3_vision_mlx_tpu.api import _load

    path = str(tmp_path / "induction_lm")
    cfg, losses = train_induction_lm(path, steps=240, bs=8, seq_len=128, seed=0)
    assert losses[-1] < 0.5 * losses[0]  # it actually learned

    lm, proc = _load(path)
    rng = np.random.default_rng(99)  # held-out docs (train used seed 1)
    tpps = []
    for i in range(3):
        doc = induction_docs(rng, 1, n_phrases=4, phrase_len=8,
                             phrases_per_doc=24)[0]
        tpp, text = measure_tokens_per_pass(
            (lm, proc), doc, max_tokens=96, spec_k=7
        )
        tpps.append(tpp)
    mean = float(np.mean(tpps))
    # Strictly inside the envelope: not the floor (1.0), not the rigged
    # ceiling (8.0).  The trained model copies phrase bodies (drafts accept)
    # and rejections land at phrase boundaries.
    assert 1.25 < mean < 7.5, tpps
