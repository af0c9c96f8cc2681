"""Vision requests in the slot serving engines (VERDICT r4 item 3).

The reference's server is text-only (/root/reference/server.py:17); its
vision path exists only in single-stream generate().  Here image requests
admit into the continuous/paged slot engines: the fused vision prefill
(engine.run_prefill's image path) produces cache columns that adopt into a
slot exactly like text — decode is indistinguishable.  Gate: token-exact
vs the single-stream VQA path, mixed with concurrent text requests.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from phi_3_vision_mlx_tpu.api import _load, _apply_chat_template
from phi_3_vision_mlx_tpu.core import weights as W
from phi_3_vision_mlx_tpu.engine.batching import BatchEngine
from phi_3_vision_mlx_tpu.engine.engine import run_prefill
from phi_3_vision_mlx_tpu.engine.paging import PagedBatchEngine
from phi_3_vision_mlx_tpu.models import phi3
from phi_3_vision_mlx_tpu.models.image_processor import Phi3VImageProcessor

VOCAB = 32064
WINDOW = 1024


def _test_image(w=100, h=60, seed=5):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))


@pytest.fixture(scope="module")
def vlmproc(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("models") / "tiny_vserve")
    W.create_random_checkpoint(path, "tiny_vision", vocab_size=VOCAB)
    lm, proc = _load(path)
    proc.img_processor = Phi3VImageProcessor(num_crops=4)  # CPU-speed config
    return lm, proc


def _single_tokens(lm, proc, prompt, n, images=None, window=WINDOW):
    """Greedy tokens via the single-stream path, prefill window pinned to
    the engine's so su-rope regimes agree (test_batching._single_tokens,
    plus the vision prefill)."""
    di = proc(prompt, images) if images is not None else proc(prompt)
    l = int(np.asarray(di["input_ids"]).shape[1])
    l_pad = max(-(-l // 64) * 64, 64)
    logits, state, _, _ = run_prefill(lm, di, max_tokens=window - l_pad)
    toks = [int(np.argmax(np.asarray(logits)[0]))]
    for _ in range(n - 1):
        res = phi3.decode_forward(
            lm.params, lm.cfg, state,
            input_ids=jnp.asarray([[toks[-1]]], jnp.int32),
        )
        state = res.state
        toks.append(int(np.argmax(np.asarray(res.logits)[0, -1])))
        if toks[-1] == lm.eos_id:
            break
    if lm.eos_id in toks:
        toks = toks[: toks.index(lm.eos_id)]
    return toks


def _vqa_prompt(n_images=1):
    prompt, _ = _apply_chat_template(
        "What is shown in this image?", None, verbose=False
    )
    tags = "".join(f"<|image_{i + 1}|>\n" for i in range(n_images))
    # _apply_chat_template prepends tags itself when images are passed; here
    # the loaded PIL images go straight to the engine, so inject the tags
    # into the templated body the same way (api._image_tags).
    return prompt.replace("What is shown", tags + "What is shown")


def test_vision_request_in_slot_engine_matches_single_stream(vlmproc):
    lm, proc = vlmproc
    img = _test_image()
    vprompt = _vqa_prompt()
    tprompt = "Describe the ocean briefly."

    eng = BatchEngine(lm, proc, slots=2, window=WINDOW)
    rv = eng.submit(vprompt, max_tokens=8, images=[img])
    rt = eng.submit(tprompt, max_tokens=8)
    while eng.pending():
        eng.step(2)

    assert eng.tokens(rv) == _single_tokens(lm, proc, vprompt, 8, images=[img])
    assert eng.tokens(rt) == _single_tokens(lm, proc, tprompt, 8)


@pytest.mark.slow
def test_vision_request_in_paged_engine(vlmproc):
    lm, proc = vlmproc
    img = _test_image(80, 50, seed=9)
    vprompt = _vqa_prompt()

    eng = PagedBatchEngine(lm, proc, slots=2, window=WINDOW, page_size=64)
    rv = eng.submit(vprompt, max_tokens=6, images=[img])
    while eng.pending():
        eng.step(2)
    assert eng.tokens(rv) == _single_tokens(lm, proc, vprompt, 6, images=[img])


@pytest.mark.slow
def test_vision_preemption_exempt(vlmproc):
    """Pool pressure never recompute-preempts a vision request (its cache
    cannot be rebuilt from token ids); the text request is the victim."""
    lm, proc = vlmproc
    img = _test_image(80, 50, seed=11)
    vprompt = _vqa_prompt()

    # pool sized so two active requests collide mid-decode
    eng = PagedBatchEngine(
        lm, proc, slots=2, window=WINDOW, page_size=64,
        pool_pages=(WINDOW // 64) + 3,
    )
    rv = eng.submit(vprompt, max_tokens=10, images=[img])
    rt = eng.submit("Text victim prompt.", max_tokens=10)
    while eng.pending():
        eng.step(2)
    # both complete (the text one via preempt+resume), vision exactly
    assert eng.tokens(rv) == _single_tokens(lm, proc, vprompt, 10, images=[img])
    assert eng.tokens(rt) == _single_tokens(
        lm, proc, "Text victim prompt.", 10
    )


@pytest.mark.slow
def test_scheduler_mixed_text_vision(vlmproc):
    """ContinuousScheduler.complete with images, concurrent with text."""
    import threading

    from phi_3_vision_mlx_tpu.serve.server import ContinuousScheduler

    lm, proc = vlmproc
    img = _test_image(90, 55, seed=13)
    vprompt = _vqa_prompt()
    sched = ContinuousScheduler(lm, proc, slots=2, window=WINDOW)

    results = {}

    def vis():
        results["v"] = sched.complete(vprompt, 6, images=[img])

    def txt():
        results["t"] = sched.complete("Scheduler text request.", 6)

    th = [threading.Thread(target=vis), threading.Thread(target=txt)]
    for t in th:
        t.start()
    for t in th:
        t.join(timeout=600)
    want_v = proc.tokenizer.decode(
        _single_tokens(lm, proc, vprompt, 6, images=[img])
    )
    want_t = proc.tokenizer.decode(
        _single_tokens(lm, proc, "Scheduler text request.", 6)
    )
    assert results["v"] == want_v
    assert results["t"] == want_t
