"""Training subsystem: losses, train step, checkpoint resume, optimizer
details, metric logging."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omnivggt_tpu.config import tiny_test_config
from omnivggt_tpu.models import omnivggt as M
from omnivggt_tpu.train import losses as LS
from omnivggt_tpu.train.step import init_state, make_optimizer, make_train_step
from omnivggt_tpu.train.optim import make_finetune_optimizer, weight_decay_mask
from omnivggt_tpu.utils import geometry as G


def _batch(B=1, S=2, H=28, W=28, seed=0):
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
        "camera_mask": np.array([True] + [False] * (S - 1)),
        "depth_mask": np.array([True] * S),
    }


def test_losses_finite_and_zero_at_gt():
    batch = _batch()
    B, S, H, W = 1, 2, 28, 28
    # predictions exactly equal to gt -> dense losses reduce to -alpha*log(conf)
    gt_norm = G.normalize_extrinsics(jnp.asarray(batch["extrinsics"]))
    gt_enc = G.extri_intri_to_pose_encoding(
        gt_norm, jnp.asarray(batch["intrinsics"]), (H, W)
    )
    preds = {
        "pose_enc_list": jnp.tile(gt_enc[None], (4, 1, 1, 1)),
        "depth": jnp.asarray(batch["depth"]),
        "depth_conf": jnp.ones((B, S, H, W)),
        "world_points": jnp.asarray(batch["world_points"]),
        "world_points_conf": jnp.ones((B, S, H, W)),
    }
    losses = LS.total_loss(preds, batch, (H, W))
    assert losses["camera"] < 1e-5
    assert abs(losses["depth"]) < 1e-6  # conf=1 -> log term 0, err 0
    assert np.isfinite(float(losses["total"]))


def test_train_step_descends():
    cfg = tiny_test_config()
    params = M.init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=100)
    state = init_state(params, opt)
    step = make_train_step(cfg, opt, use_aux_inputs=True)
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    # optimisation makes progress on a fixed batch (first step is warmup, lr=0)
    assert min(losses[2:]) < losses[0]
    assert float(metrics["grad_norm"]) > 0


def test_train_step_dots_remat_policy():
    """remat='dots' (keep matmul outputs; less recompute, more memory) must
    produce the same gradients as the full-recompute policy."""
    cfg = tiny_test_config()
    opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=100)
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}

    outs = {}
    for policy in (True, "dots"):
        # fresh params per run: the train step donates its input state
        params = M.init(jax.random.PRNGKey(0), cfg)
        step = make_train_step(cfg, opt, use_aux_inputs=True, remat=policy)
        state, metrics = step(init_state(params, opt), batch)
        outs[policy] = (float(metrics["total"]), float(metrics["grad_norm"]))
    assert np.isfinite(outs["dots"]).all()
    np.testing.assert_allclose(outs[True][0], outs["dots"][0], rtol=1e-6)
    np.testing.assert_allclose(outs[True][1], outs["dots"][1], rtol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    from omnivggt_tpu.train.checkpointing import (
        latest_checkpoint, resume_or_init, save_train_state,
    )

    cfg = tiny_test_config()
    params = M.init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    state = init_state(params, opt)
    path = save_train_state(str(tmp_path), state)
    assert latest_checkpoint(str(tmp_path)) == path

    # perturb, then resume must restore the saved values
    other = init_state(M.init(jax.random.PRNGKey(1), cfg), opt)
    restored = resume_or_init(str(tmp_path), other)
    a = params["camera_head"]["embed_pose"]["w"]
    b = restored.params["camera_head"]["embed_pose"]["w"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_params_roundtrip(tmp_path):
    from omnivggt_tpu.checkpoint import load_orbax, save_orbax

    cfg = tiny_test_config()
    params = M.init(jax.random.PRNGKey(0), cfg)
    save_orbax(str(tmp_path / "ckpt"), params)
    back = load_orbax(str(tmp_path / "ckpt"), like=params)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weight_decay_mask_and_layer_decay():
    cfg = tiny_test_config()
    params = M.init(jax.random.PRNGKey(0), cfg)
    mask = weight_decay_mask(params)
    # norms/biases excluded, qkv weights included
    assert mask["aggregator"]["frame_blocks"]["norm1"]["scale"] is False
    assert mask["aggregator"]["frame_blocks"]["attn"]["qkv"]["b"] is False
    assert mask["aggregator"]["frame_blocks"]["attn"]["qkv"]["w"] is True

    from omnivggt_tpu.train.optim import scale_by_layer_decay

    ld = scale_by_layer_decay(params, layer_decay=0.5)
    state = ld.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = ld.update(grads, state)
    u = np.asarray(updates["aggregator"]["frame_blocks"]["attn"]["qkv"]["w"])
    # layer 0 (earliest) gets smaller updates than the last layer (0.5x here)
    assert np.abs(u[0]).mean() == pytest.approx(0.5 * np.abs(u[-1]).mean())
    # non-stacked leaves pass through unscaled
    ch = np.asarray(updates["camera_head"]["embed_pose"]["w"])
    assert ch.max() == 1.0

    # the full finetune optimizer runs end to end (after warmup, updates move)
    opt = make_finetune_optimizer(params, layer_decay=0.5, warmup_steps=1)
    ostate = opt.init(params)
    up1, ostate = opt.update(grads, ostate, params)
    up2, ostate = opt.update(grads, ostate, params)
    assert np.abs(np.asarray(up2["camera_head"]["embed_pose"]["w"])).max() > 0


def test_metric_logger(tmp_path):
    from omnivggt_tpu.utils.logging import MetricLogger, SmoothedValue

    sv = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        sv.update(v)
    assert sv.median == 3.0 and sv.global_avg == 2.5 and sv.value == 4.0

    ml = MetricLogger(jsonl_path=str(tmp_path / "log.jsonl"))
    ml.update(loss=1.5, acc=0.9)
    ml.update(loss=0.5, acc=1.0)
    assert abs(ml.loss.global_avg - 1.0) < 1e-9
    lines = (tmp_path / "log.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2

    seen = list(ml.log_every(range(5), print_freq=2, header="t"))
    assert seen == list(range(5))


def test_aa_order_global_first():
    """aa_order=("global","frame") runs and differs from frame-first."""
    import dataclasses

    cfg = tiny_test_config()
    cfg2 = dataclasses.replace(
        cfg, aggregator=dataclasses.replace(cfg.aggregator, aa_order=("global", "frame"))
    )
    params = M.init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 2, 28, 28, 3)).astype(np.float32))
    p1 = M.apply(params, imgs, cfg)
    p2 = M.apply(params, imgs, cfg2)
    assert np.abs(np.asarray(p1["pose_enc"]) - np.asarray(p2["pose_enc"])).max() > 1e-6


def test_train_step_with_drop_path():
    """Stochastic depth wired through the scan: the step runs, loss is finite,
    and the forward is stochastic across steps (different fold-in rng) but the
    eval forward stays deterministic."""
    import dataclasses

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        aggregator=dataclasses.replace(cfg.aggregator, drop_path_rate=0.5),
    )
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    params = M.init(jax.random.PRNGKey(0), cfg)

    # train_rng makes the forward stochastic; same key reproduces
    # (run before the train steps: donate_argnums consumes params)
    r1 = M.apply(params, batch["images"], cfg, train_rng=jax.random.PRNGKey(1))
    r1b = M.apply(params, batch["images"], cfg, train_rng=jax.random.PRNGKey(1))
    r2 = M.apply(params, batch["images"], cfg, train_rng=jax.random.PRNGKey(2))
    ev1 = M.apply(params, batch["images"], cfg)
    ev2 = M.apply(params, batch["images"], cfg)
    np.testing.assert_array_equal(np.asarray(r1["depth"]), np.asarray(r1b["depth"]))
    # new-style typed PRNG keys must work too (same impl/seed -> same stream)
    r_typed = M.apply(params, batch["images"], cfg, train_rng=jax.random.key(1))
    np.testing.assert_array_equal(
        np.asarray(r_typed["depth"]), np.asarray(r1["depth"])
    )
    np.testing.assert_array_equal(np.asarray(ev1["depth"]), np.asarray(ev2["depth"]))
    assert not np.array_equal(np.asarray(r1["depth"]), np.asarray(r2["depth"]))
    assert not np.array_equal(np.asarray(r1["depth"]), np.asarray(ev1["depth"]))

    opt = make_optimizer()
    step = make_train_step(cfg, opt, use_aux_inputs=True, remat=False)
    state = init_state(params, opt)
    state, m1 = step(state, batch)
    state, m2 = step(state, batch)
    assert np.isfinite(float(m1["total"])) and np.isfinite(float(m2["total"]))
