"""SceneViz, pointmap meshing, CO3D depth IO, sky CC heuristic."""

import numpy as np
import pytest
import PIL.Image

from omnivggt_tpu.data.image_io import (
    load_16bit_png_depth,
    read_depth,
    threshold_depth_map,
)
from omnivggt_tpu.viz.scene import SceneViz, pts3d_to_mesh, cat_meshes, segment_sky_hsv_cc
from tests.reference_util import install_reference, reference_available

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


def _grid_pts(H=5, W=6):
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    return np.stack([x, y, np.ones_like(x)], -1).astype(np.float32)


def test_pts3d_to_mesh():
    H, W = 5, 6
    img = np.random.default_rng(0).uniform(size=(H, W, 3)).astype(np.float32)
    pts = _grid_pts(H, W)
    m = pts3d_to_mesh(img, pts)
    assert m["vertices"].shape == (H * W, 3)
    assert len(m["faces"]) == 4 * (H - 1) * (W - 1)
    assert len(m["faces"]) == len(m["face_colors"])

    valid = np.ones((H, W), bool)
    valid[0, 0] = False
    m2 = pts3d_to_mesh(img, pts, valid)
    assert len(m2["faces"]) < len(m["faces"])
    assert not np.any(m2["faces"] == 0)  # no face touches the invalid vertex

    both = cat_meshes([m, m2])
    assert len(both["vertices"]) == 2 * H * W


@needs_ref
def test_pts3d_to_mesh_parity():
    install_reference()
    from omnivggt.viz import pts3d_to_trimesh

    H, W = 4, 5
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    pts = rng.normal(size=(H, W, 3)).astype(np.float32)
    valid = rng.uniform(size=(H, W)) > 0.3

    ref = pts3d_to_trimesh(img, pts, valid)
    ours = pts3d_to_mesh(img, pts, valid)
    np.testing.assert_array_equal(ref["vertices"], ours["vertices"])
    np.testing.assert_array_equal(ref["faces"], ours["faces"])
    np.testing.assert_array_equal(ref["face_colors"], ours["face_colors"])


def test_scene_viz_glb(tmp_path):
    rng = np.random.default_rng(2)
    viz = SceneViz()
    viz.add_pointcloud(
        rng.normal(size=(50, 3)), rng.uniform(size=(50, 3)),
        mask=rng.uniform(size=50) > 0.2,
    )
    img = rng.uniform(size=(4, 5, 3)).astype(np.float32)
    viz.add_mesh(img, _grid_pts(4, 5))
    viz.add_camera(np.eye(4), color=(255, 0, 0))
    path = viz.save_glb(str(tmp_path / "scene.glb"))
    assert path and (tmp_path / "scene.glb").stat().st_size > 500


def test_co3d_depth_io(tmp_path):
    rng = np.random.default_rng(3)
    depth = rng.uniform(0.1, 10, size=(8, 9)).astype(np.float16)
    packed = depth.view(np.uint16)
    PIL.Image.fromarray(packed.astype(np.int32), mode="I").save(
        tmp_path / "d.png", bits=16
    )
    # round-trip through the 16-bit png convention
    import PIL.Image as I

    arr = np.asarray(I.open(tmp_path / "d.png"))
    if arr.dtype != np.uint16:
        # Pillow may save mode I as 32-bit; write explicitly as uint16 instead
        I.fromarray(packed, mode="I;16").save(tmp_path / "d.png")
    loaded = load_16bit_png_depth(str(tmp_path / "d.png"))
    np.testing.assert_allclose(loaded, depth.astype(np.float32), atol=1e-3)
    loaded2 = read_depth(str(tmp_path / "d.png"), scale_adjustment=2.0)
    np.testing.assert_allclose(loaded2, 2 * depth.astype(np.float32), atol=1e-2)


@needs_ref
def test_threshold_depth_map_parity():
    install_reference()
    from omnivggt.datasets.utils.misc import threshold_depth_map as ref_thr

    rng = np.random.default_rng(4)
    d = rng.uniform(0, 120, size=(20, 20)).astype(np.float32)
    ref = ref_thr(d.copy(), max_percentile=95, min_percentile=5, max_depth=100)
    ours = threshold_depth_map(d.copy(), max_percentile=95, min_percentile=5, max_depth=100)
    np.testing.assert_array_equal(ref, ours)


def test_segment_sky_cc():
    img = np.zeros((40, 40, 3), np.uint8)
    img[:18] = [140, 190, 255]  # big light-blue sky region
    img[25:30, 3:8] = [250, 250, 250]  # small bright blob (smaller CC)
    mask = segment_sky_hsv_cc(img)
    assert mask[:15].mean() > 0.8
    assert mask[32:].mean() < 0.2
