"""Training dataset pipeline on the real example scenes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omnivggt_tpu.data.dataset import SceneDataset, prefetch
from tests.reference_util import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference example scenes not mounted"
)

EXAMPLES = "/root/reference/example"


def test_scene_discovery_and_sample():
    ds = SceneDataset(
        f"{EXAMPLES}/office", views_per_sample=3, camera_keep_prob=1.0, seed=0
    )
    assert len(ds) >= 1
    b = ds.sample()
    assert b["images"].shape == (1, 3, 392, 518, 3)
    assert b["extrinsics"].shape == (1, 3, 3, 4)
    assert b["camera_mask"].shape == (3,)
    # office has cameras for every frame; keep_prob=1 -> all kept
    assert b["camera_mask"].all()
    # office ships no depth
    assert not b["depth_mask"].any()
    assert b["depth_valid"].sum() == 0


def test_infinigen_full_modality_sample():
    ds = SceneDataset(
        f"{EXAMPLES}/infinigen", views_per_sample=2,
        camera_keep_prob=1.0, depth_keep_prob=1.0, seed=1,
    )
    b = ds.sample()
    # infinigen has cameras + .npy depths: world points derived by unprojection
    assert b["depth_mask"].all()
    assert b["camera_valid"].all()
    assert b["depth_valid"].sum() > 0
    wp = b["world_points"][0]
    valid = b["point_valid"][0] > 0
    assert valid.any()
    assert np.isfinite(wp[valid]).all()
    assert np.abs(wp[valid]).max() > 0

    # supervision-frame consistency: unprojecting the (normalised) depth with
    # the (normalised) extrinsics must reproduce the stored world points
    from omnivggt_tpu.utils.geometry import unproject_depth_map_to_point_map

    re_wp = unproject_depth_map_to_point_map(
        b["depth"][0], b["extrinsics"][0], b["intrinsics"][0]
    )
    np.testing.assert_allclose(re_wp[valid], wp[valid], atol=1e-3, rtol=1e-3)
    # frame 0 is the normalisation anchor: its extrinsics are ~identity
    np.testing.assert_allclose(
        b["extrinsics"][0, 0, :3, :3], np.eye(3), atol=1e-5
    )

    # first-frame camera rule: if any frame keeps camera GT, frame 0 does
    for seed in range(5):
        b = SceneDataset(
            f"{EXAMPLES}/infinigen", views_per_sample=2,
            camera_keep_prob=0.5, seed=seed,
        ).sample()
        if b["camera_mask"].any():
            assert b["camera_mask"][0]


def test_prefetch_propagates_errors():
    def boom():
        yield {"i": 0}
        raise RuntimeError("corrupt sample")

    it = prefetch(boom())
    assert next(it)["i"] == 0
    with pytest.raises(RuntimeError, match="corrupt sample"):
        next(it)


def test_batches_feed_train_step():
    from omnivggt_tpu.config import tiny_test_config
    from omnivggt_tpu.models import omnivggt as M
    from omnivggt_tpu.train.step import init_state, make_optimizer, make_train_step

    ds = SceneDataset(f"{EXAMPLES}/infinigen", views_per_sample=2, seed=2)
    cfg = tiny_test_config()
    params = M.init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(warmup_steps=1, total_steps=10)
    state = init_state(params, opt)
    step = make_train_step(cfg, opt, use_aux_inputs=True)

    sz = cfg.img_size
    for batch in prefetch(ds.batches(n_steps=2)):
        # tiny config wants tiny images: stride-subsample like the CLI
        st = max(batch["images"].shape[2] // sz, 1)
        for k in ("images", "depth", "depth_valid", "world_points", "point_valid"):
            batch[k] = batch[k][:, :, ::st, ::st][:, :, :sz, :sz]
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["total"]))


def test_prefetch_order():
    items = list(prefetch(iter([{"i": i} for i in range(5)])))
    assert [x["i"] for x in items] == list(range(5))
