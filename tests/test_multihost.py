"""Multi-host (DCN axis) smoke tests.

A (dcn, data, model) mesh built from two *separate processes* (CPU backend,
``jax.distributed.initialize`` + Gloo collectives) must run a full
tensor-parallel + data-parallel LoRA train step and agree with the
single-process 8-device mesh bit-for-bit.  This validates the
``jax.distributed`` plumbing and the (dcn, data)-joint batch sharding that a
real multi-slice TPU deployment would use (SURVEY.md §2.9).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize("localhost:" + port, num_processes=n, process_id=pid)
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {repo!r} + "/tests")
    from test_multihost import train_step_loss
    loss = train_step_loss(dcn=n)
    print(f"LOSS {{loss:.6f}}", flush=True)
    """
)


def train_step_loss(dcn: int = 1) -> float:
    """One dp+tp LoRA train step on a (dcn?, data=2, model=2) mesh."""
    import jax
    import jax.numpy as jnp
    import optax

    from phi_3_vision_mlx_tpu.core.config import preset
    from phi_3_vision_mlx_tpu.models import phi3
    from phi_3_vision_mlx_tpu.parallel.mesh import make_mesh
    from phi_3_vision_mlx_tpu.parallel.sharding import shard_batch, shard_params
    from phi_3_vision_mlx_tpu.train.lora import (
        inject_lora,
        mask_lora_grads,
        merge_lora,
        partition_lora,
    )

    cfg = preset(
        "tiny",
        hidden_size=256,
        intermediate_size=512,
        num_attention_heads=8,
        num_key_value_heads=8,
        num_hidden_layers=2,
        vocab_size=4096,
    )
    mesh = make_mesh(data=2, model=2, dcn=dcn) if dcn > 1 else make_mesh(
        data=2, model=2
    )
    params = phi3.init_params(cfg, jax.random.PRNGKey(0))
    params, layer_mask = inject_lora(
        params, cfg, ["self_attn.qkv_proj"], 1, 2, jax.random.PRNGKey(1)
    )
    params = shard_params(params, mesh)
    trainable, frozen = partition_lora(params)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(trainable)

    def loss_fn(trainable, frozen, batch):
        p = merge_lora(frozen, trainable)
        logits = phi3.forward_nocache(
            p, cfg, batch["ids"], pids=batch["pids"], prompt_valid=batch["valid"]
        ).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], batch["targets"]
        )
        return (ce * batch["loss_masks"]).mean()

    @jax.jit
    def train_step(trainable, opt_state, frozen, batch):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen, batch)
        grads = mask_lora_grads(grads, layer_mask)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    rng = np.random.default_rng(0)
    b, l = 8, 32  # same global batch regardless of dcn
    batch = shard_batch(
        {
            "ids": rng.integers(2, 4000, (b, l)).astype(np.int32),
            "pids": np.tile(np.arange(l, dtype=np.int32), (b, 1)),
            "valid": np.ones((b, l), bool),
            "targets": rng.integers(2, 4000, (b, l - 1)).astype(np.int32),
            "loss_masks": np.ones((b, l - 1), np.float32),
        },
        mesh,
    )
    _, _, loss = train_step(trainable, opt_state, frozen, batch)
    return float(jax.block_until_ready(loss))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dcn_matches_single_process(tmp_path):
    single = train_step_loss(dcn=1)

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("LOSS ")]
        assert lines, out[-2000:]
        losses.append(float(lines[-1].split()[1]))
    assert losses[0] == losses[1]
    np.testing.assert_allclose(losses[0], single, rtol=1e-4)
