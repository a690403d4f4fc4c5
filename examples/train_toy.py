"""Toy training loop: overfit the model on one synthetic scene.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/train_toy.py

Demonstrates the full training subsystem — sharded (data x seq) train step
with modality injection, remat, layer-decay finetune optimizer, metric
logging, and checkpoint save/resume — at toy sizes.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omnivggt_tpu.utils.platform import ensure_platform

ensure_platform()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from omnivggt_tpu.config import tiny_test_config  # noqa: E402
from omnivggt_tpu.models import omnivggt as M  # noqa: E402
from omnivggt_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402
from omnivggt_tpu.parallel.sharding import ModelSharding  # noqa: E402
from omnivggt_tpu.train.checkpointing import resume_or_init, save_train_state  # noqa: E402
from omnivggt_tpu.train.optim import make_finetune_optimizer  # noqa: E402
from omnivggt_tpu.train.step import init_state, make_train_step  # noqa: E402
from omnivggt_tpu.utils import geometry as G  # noqa: E402
from omnivggt_tpu.utils.logging import MetricLogger  # noqa: E402


def synthetic_batch(B, S, H, W, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, S, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ex = np.zeros((B, S, 3, 4), np.float32)
    ex[..., :3] = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    ex[..., 3] = rng.normal(size=(B, S, 3))
    K = np.zeros((B, S, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 30.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = W / 2, H / 2, 1.0
    return {
        "images": rng.uniform(size=(B, S, H, W, 3)).astype(np.float32),
        "extrinsics": ex,
        "intrinsics": K,
        "depth": rng.uniform(0.5, 5.0, size=(B, S, H, W, 1)).astype(np.float32),
        "depth_valid": np.ones((B, S, H, W), np.float32),
        "world_points": rng.normal(size=(B, S, H, W, 3)).astype(np.float32),
        "camera_mask": np.array([True] + [False] * (S - 1)),
        "depth_mask": np.array([True] * S),
    }


def main(steps: int = 20, ckpt_dir: str = "/tmp/omnivggt_toy_ckpt"):
    n = len(jax.devices())
    data = 2 if n % 2 == 0 and n > 1 else 1
    mesh = make_mesh(data=data, seq=n // data)
    sharding = ModelSharding(mesh)

    cfg = tiny_test_config()
    params = M.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_finetune_optimizer(
        params, learning_rate=3e-4, warmup_steps=2, total_steps=steps
    )
    state = resume_or_init(ckpt_dir, init_state(params, optimizer))
    train_step = make_train_step(cfg, optimizer, sharding, use_aux_inputs=True)

    batch = shard_batch(
        mesh,
        {k: jnp.asarray(v) for k, v in synthetic_batch(data, 2 * (n // data), 28, 28).items()},
    )

    logger = MetricLogger(jsonl_path=os.path.join("/tmp", "toy_train.jsonl"))
    for _ in logger.log_every(range(steps), print_freq=5, header="toy"):
        state, metrics = train_step(state, batch)
        logger.update(**{k: float(v) for k, v in metrics.items()})

    path = save_train_state(ckpt_dir, state)
    print(f"final loss {logger.total.value:.4f}; checkpoint at {path}")


if __name__ == "__main__":
    main()
