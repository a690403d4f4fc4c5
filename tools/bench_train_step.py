"""Full train-step throughput on the real chip.

Default: a mid-size config that fits one v5e with fp32 optimizer state
(ViT-B trunk, 12+12 aggregator, ~450M params), S=4 @ 518 px, remat on —
measures the whole training subsystem (fused flash backward,
confidence-weighted losses, layer-decay AdamW) on hardware. Chip result:
434 ms/step (9.2 views/s), stable across runs with the batch staged
on-device. (Round 2 recorded 975 ms, but that measurement re-transferred
the ~60 MB numpy batch through the TPU tunnel every step — transfer noise,
not compute; real pipelines prefetch. Unstaged runs vary 1.0-2.1 s.)

TRAIN_ARCH=flagship TRAIN_VIEWS=1|2 probes the single-chip 1.2B boundary.
Measured (r4, this chip): S=1 fails to compile with "Ran out of memory in
memory space hbm. Used 21.82G of 15.75G hbm. Exceeded hbm capacity by
6.07G" — fp32 params 4.9 GB + grads 4.9 GB + AdamW m/v 9.8 GB is 19.6 GB
before a single activation, so NO view count fits: flagship training is
the 8-chip sharded path by necessity, not preference (__graft_entry__
dryrun validates it; the 449M ViT-B config above is the single-chip
training story).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from omnivggt_tpu.utils.platform import ensure_platform
ensure_platform()
import numpy as np
import jax, jax.numpy as jnp
from omnivggt_tpu.config import OmniVGGTConfig, AggregatorConfig, CameraHeadConfig, DPTHeadConfig
from omnivggt_tpu.models import omnivggt as M
from omnivggt_tpu.train.optim import make_finetune_optimizer
from omnivggt_tpu.train.step import init_state, make_train_step
from omnivggt_tpu.utils import geometry as G

if os.environ.get("TRAIN_ARCH", "vitb") == "flagship":
    cfg = OmniVGGTConfig()  # the 1.2B ViT-L flagship, reference defaults
    S_default = 2
else:
    E = 768
    cfg = OmniVGGTConfig(
        embed_dim=E,
        aggregator=AggregatorConfig(
            embed_dim=E, depth=12, num_heads=12,
            patch_embed="dinov2_vitb14_reg",
        ),
        camera_head=CameraHeadConfig(dim_in=2 * E),
        depth_head=DPTHeadConfig(
            dim_in=2 * E, output_dim=2, activation="exp",
            intermediate_layer_idx=(2, 5, 8, 11),
        ),
        point_head=DPTHeadConfig(
            dim_in=2 * E, output_dim=4, activation="inv_log",
            intermediate_layer_idx=(2, 5, 8, 11),
        ),
    )
    S_default = 4
params = jax.jit(lambda k: M.init(k, cfg))(jax.random.PRNGKey(0))
n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
print(f"params: {n_params/1e6:.0f}M")

B, S, H, W = 1, int(os.environ.get("TRAIN_VIEWS", S_default)), 518, 518
print(f"arch={os.environ.get('TRAIN_ARCH', 'vitb')} S={S}")
rng = np.random.default_rng(0)
quat = rng.normal(size=(B, S, 4)).astype(np.float32)
quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
ex = np.zeros((B, S, 3, 4), np.float32)
ex[..., :3] = np.asarray(G.quat_to_mat(jnp.asarray(quat)))
ex[..., 3] = rng.normal(size=(B, S, 3))
K = np.tile(np.diag([500.0, 500.0, 1.0]).astype(np.float32), (B, S, 1, 1))
K[..., 0, 2] = K[..., 1, 2] = H / 2
batch = {
    "images": rng.uniform(size=(B, S, H, W, 3)).astype(np.float32),
    "extrinsics": ex,
    "intrinsics": K,
    "depth": rng.uniform(0.5, 3, size=(B, S, H, W, 1)).astype(np.float32),
    "depth_valid": np.ones((B, S, H, W), np.float32),
    "world_points": rng.normal(size=(B, S, H, W, 3)).astype(np.float32),
    "point_valid": np.ones((B, S, H, W), np.float32),
    "camera_mask": np.arange(S) < 1,
    "depth_mask": np.arange(S) < max(S // 2, 1),
    "camera_valid": np.ones((S,), bool),
}
opt = make_finetune_optimizer(params, total_steps=1000)
step_fn = make_train_step(cfg, opt, None, use_aux_inputs=True, remat=True)
state = init_state(params, opt)

# stage the batch on-device once: re-transferring ~60 MB of numpy through
# the TPU tunnel every call dominates (and wildly varies) the measurement —
# a real input pipeline overlaps transfers with compute (data/dataset.py
# prefetch), so the step time should measure the step
batch = jax.device_put(batch)
jax.block_until_ready(batch)

state, metrics = step_fn(state, batch)
np.asarray(metrics["total"])
t0 = time.perf_counter()
for _ in range(3):
    state, metrics = step_fn(state, batch)
np.asarray(metrics["total"])
dt = (time.perf_counter() - t0) / 3
print(f"train step: {dt*1e3:.0f} ms ({S/dt:.2f} views/s) loss={float(metrics['total']):.3f}")
