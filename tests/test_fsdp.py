"""ZeRO-style training-state sharding (parallel/fsdp.py): spec selection,
numerical identity with replicated-state training, born-sharded init, and
the flagship memory accounting that motivates the subsystem."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from omnivggt_tpu.config import tiny_test_config
from omnivggt_tpu.models import omnivggt as M
from omnivggt_tpu.parallel import fsdp
from omnivggt_tpu.parallel.mesh import make_mesh, shard_batch
from omnivggt_tpu.parallel.sharding import ModelSharding
from omnivggt_tpu.train.step import init_state, make_optimizer, make_train_step
from omnivggt_tpu.utils import geometry as G

needs_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

AXES = ("data", "seq")


def test_spec_for_leaf_selection():
    # largest divisible dim wins; ties prefer the trailing dim
    assert fsdp.spec_for_leaf((24, 4096, 1024), 8, AXES, 0) == P(None, AXES)
    assert fsdp.spec_for_leaf((256, 256), 8, AXES, 0) == P(None, AXES)
    # leading scan-stack axis only if it is the largest divisible dim
    assert fsdp.spec_for_leaf((64, 7), 8, AXES, 0) == P(AXES)
    # nothing divisible -> replicated
    assert fsdp.spec_for_leaf((7, 9), 8, AXES, 0) == P()
    # below min_elems -> replicated
    assert fsdp.spec_for_leaf((8, 8), 8, AXES, 128) == P()
    # scalars -> replicated
    assert fsdp.spec_for_leaf((), 8, AXES, 0) == P()


def _batch(B=2, S=4, H=28, W=28, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, S, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ex = np.zeros((B, S, 3, 4), np.float32)
    ex[..., :3] = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    ex[..., 3] = rng.normal(size=(B, S, 3))
    K = np.zeros((B, S, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 30.0
    K[..., 0, 2] = W / 2
    K[..., 1, 2] = H / 2
    K[..., 2, 2] = 1.0
    return {
        "images": rng.uniform(size=(B, S, H, W, 3)).astype(np.float32),
        "extrinsics": ex,
        "intrinsics": K,
        "depth": rng.uniform(0.5, 5.0, size=(B, S, H, W, 1)).astype(np.float32),
        "depth_valid": np.ones((B, S, H, W), np.float32),
        "world_points": rng.normal(size=(B, S, H, W, 3)).astype(np.float32),
    }


def _largest_leaf(tree):
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "size")]
    return max(leaves, key=lambda x: x.size)


@needs_8dev
@pytest.mark.parametrize("mode", ["zero2", "fsdp"])
def test_state_sharding_matches_replicated(mode, monkeypatch):
    """zero2/fsdp train steps produce the same losses/params as the
    replicated-state step (identical math, different layout), and the state
    actually lands sharded."""
    monkeypatch.setattr(fsdp, "_MIN_SHARD_ELEMS", 0)
    cfg = tiny_test_config()
    opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=100)
    mesh = make_mesh(data=2, seq=4)
    sharding = ModelSharding(mesh, global_attn="allgather")
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in _batch().items()})

    results = {}
    for m in ("none", mode):
        if m == "none":
            state = init_state(M.init(jax.random.PRNGKey(0), cfg), opt)
        else:
            state = fsdp.sharded_init(
                functools.partial(M.init, jax.random.PRNGKey(0), cfg),
                opt, mesh, m,
            )
        step = make_train_step(cfg, opt, sharding, state_sharding=m)
        metrics = None
        for _ in range(3):
            state, metrics = step(state, batch)
        results[m] = (
            {k: float(v) for k, v in metrics.items()},
            np.asarray(_largest_leaf(state.params)),
            state,
        )

    ref_metrics, ref_param, _ = results["none"]
    got_metrics, got_param, state = results[mode]
    for k in ref_metrics:
        np.testing.assert_allclose(
            got_metrics[k], ref_metrics[k], rtol=2e-4, atol=1e-6, err_msg=k
        )
    np.testing.assert_allclose(got_param, ref_param, rtol=1e-4, atol=1e-6)

    # layout assertions: moments sharded in both modes; params sharded only
    # under fsdp (zero2 keeps them replicated for a gather-free forward)
    mu_leaf = _largest_leaf(
        [s for s in jax.tree.leaves(state.opt_state, is_leaf=None)]
    )
    assert not mu_leaf.sharding.is_fully_replicated
    p_leaf = _largest_leaf(state.params)
    if mode == "fsdp":
        assert not p_leaf.sharding.is_fully_replicated
    else:
        assert p_leaf.sharding.is_fully_replicated


@needs_8dev
def test_sharded_init_born_sharded(monkeypatch):
    """sharded_init's out_shardings place every large moment (and, under
    fsdp, every large param) sharded from the first materialisation."""
    monkeypatch.setattr(fsdp, "_MIN_SHARD_ELEMS", 0)
    cfg = tiny_test_config()
    opt = make_optimizer()
    mesh = make_mesh(data=1, seq=8)
    init_fn = functools.partial(M.init, jax.random.PRNGKey(0), cfg)

    st_z2 = fsdp.sharded_init(init_fn, opt, mesh, "zero2")
    assert _largest_leaf(st_z2.params).sharding.is_fully_replicated
    assert not _largest_leaf(st_z2.opt_state).sharding.is_fully_replicated

    st_fsdp = fsdp.sharded_init(init_fn, opt, mesh, "fsdp")
    assert not _largest_leaf(st_fsdp.params).sharding.is_fully_replicated

    # values identical to the unsharded init regardless of layout
    ref = init_state(init_fn(), opt)
    np.testing.assert_array_equal(
        np.asarray(_largest_leaf(st_fsdp.params)),
        np.asarray(_largest_leaf(ref.params)),
    )

    with pytest.raises(ValueError, match="state_sharding"):
        fsdp.sharded_init(init_fn, opt, mesh, "zero9")


@needs_8dev
def test_flagship_state_accounting():
    """The accounting that makes this subsystem load-bearing: the 1.2B
    flagship's replicated fp32 training state exceeds a v5e's 15.75 GB HBM
    (so replicated-state training OOMs at ANY mesh size — measured on-chip:
    21.82G requested at S=1), while zero2/fsdp shard it to a small fraction.
    Pure eval_shape — nothing materialises."""
    from omnivggt_tpu.config import OmniVGGTConfig

    opt = make_optimizer()
    shapes = jax.eval_shape(
        lambda: init_state(M.init(jax.random.PRNGKey(0), OmniVGGTConfig()), opt)
    )
    mesh = make_mesh(data=1, seq=8)
    GB = 1024**3
    none_b = fsdp.state_bytes_per_device(shapes, mesh, "none")
    z2_b = fsdp.state_bytes_per_device(shapes, mesh, "zero2")
    fsdp_b = fsdp.state_bytes_per_device(shapes, mesh, "fsdp")
    # replicated params + m/v = 13.6 GiB; the gradient tree (params-sized,
    # 4.5 GiB) pushes the replicated total past the 15.75 GB HBM — at any
    # mesh size
    import math

    grad_b = sum(
        math.prod(x.shape) * x.dtype.itemsize
        for x in jax.tree.leaves(shapes.params)
    )
    hbm = 15.75e9
    assert none_b + grad_b > hbm
    assert z2_b + grad_b // 8 < 8 * GB
    assert fsdp_b + grad_b // 8 < 2.6 * GB
    assert fsdp_b < z2_b < none_b
