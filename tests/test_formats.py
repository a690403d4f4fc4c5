"""ScanNet / CO3D format readers, validated on synthetic fixtures with known
cameras (round-trips through the PyTorch3D NDC and c2w conventions)."""

import gzip
import json
import os

import numpy as np
import pytest
from PIL import Image

from omnivggt_tpu.data.formats import (
    _pt3d_ndc_to_pixel_K,
    _pt3d_pose_to_opencv_w2c,
    detect_scene_format,
    load_co3d_sequence,
    load_scannet_scene,
    load_scene,
)

W0, H0 = 64, 48  # fixture resolution (width, height)
TARGET = 28  # small 14-multiple so tests stay fast


def _write_scannet(root):
    scene = os.path.join(root, "scene0000_00")
    for sub in ("color", "depth", "pose", "intrinsic"):
        os.makedirs(os.path.join(scene, sub))
    rng = np.random.default_rng(0)
    K = np.array([[50.0, 0, W0 / 2], [0, 50.0, H0 / 2], [0, 0, 1]])
    np.savetxt(
        os.path.join(scene, "intrinsic", "intrinsic_color.txt"),
        np.block([[K, np.zeros((3, 1))], [np.zeros((1, 3)), np.ones((1, 1))]]),
    )
    poses = []
    for i in range(3):
        img = (rng.uniform(size=(H0, W0, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(scene, "color", f"{i}.jpg"))
        # 16-bit depth in millimetres at HALF resolution (sensor grid)
        d_mm = (rng.uniform(500, 3000, size=(H0 // 2, W0 // 2))).astype(
            np.uint16
        )
        Image.fromarray(d_mm).save(
            os.path.join(scene, "depth", f"{i}.png")
        )
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i, 0.0, 0.2 * i]
        if i == 2:
            c2w[0, 0] = -np.inf  # ScanNet invalid-pose marker
        poses.append(c2w)
        np.savetxt(os.path.join(scene, "pose", f"{i}.txt"), c2w)
    return scene, K, poses


def test_scannet_reader(tmp_path):
    scene, K0, poses = _write_scannet(str(tmp_path))
    assert detect_scene_format(scene) == "scannet"
    images, ex, Kr, depths, masks, d_idx, c_idx = load_scannet_scene(
        scene, target_size=TARGET
    )
    S, H, W, _ = images.shape
    assert S == 3 and W == TARGET and H % 14 == 0
    # the invalid-pose frame keeps its image but has no camera GT
    assert c_idx == [0, 1]
    assert d_idx == [0, 1, 2]
    # w2c == inv(c2w) for valid frames
    w2c = np.linalg.inv(poses[1])[:3]
    np.testing.assert_allclose(ex[0, 1], w2c, atol=1e-6)
    assert np.all(ex[0, 2] == 0)
    # intrinsics rescaled by the resize factor
    np.testing.assert_allclose(Kr[0, 0, 0, 0], K0[0, 0] * TARGET / W0, rtol=1e-6)
    # depth is metres, resized to the colour grid, masked where valid
    assert depths.shape == (1, 3, H, W, 1)
    assert 0.4 < depths[0, 0][masks[0, 0] > 0].mean() < 3.1
    assert masks[0, 2].any()


def _write_co3d(root, fmt):
    cat = os.path.join(root, "plant")
    seq = os.path.join(cat, "106_12345_6789")
    os.makedirs(os.path.join(seq, "images"))
    os.makedirs(os.path.join(seq, "depths"))
    rng = np.random.default_rng(1)

    # ground-truth OpenCV camera to recover
    K_px = np.array([[55.0, 0, 30.0], [0, 52.0, 26.0], [0, 0, 1]])
    R_cv_list, t_cv_list, frames = [], [], []
    for i in range(2):
        img = (rng.uniform(size=(H0, W0, 3)) * 255).astype(np.uint8)
        ipath = f"plant/106_12345_6789/images/frame{i:06d}.jpg"
        Image.fromarray(img).save(os.path.join(root, ipath))
        d = rng.uniform(0.5, 2.0, size=(H0, W0)).astype(np.float32)
        # CO3D 16-bit depth: float16 bit pattern stored as uint16
        d16 = d.astype(np.float16).view(np.uint16)
        dpath = f"plant/106_12345_6789/depths/frame{i:06d}.png"
        Image.fromarray(d16).save(os.path.join(root, dpath))

        # random OpenCV pose; convert to the PyTorch3D annotation convention
        # (the reader must invert this mapping exactly)
        theta = 0.3 * (i + 1)
        R_cv = np.array(
            [[np.cos(theta), -np.sin(theta), 0],
             [np.sin(theta), np.cos(theta), 0],
             [0, 0, 1]]
        )
        t_cv = np.array([0.1 * i, -0.05, 1.5])
        R_cv_list.append(R_cv)
        t_cv_list.append(t_cv)
        flip = np.diag([-1.0, -1.0, 1.0])
        R_pt3d = (flip @ R_cv).T
        T_pt3d = flip @ t_cv
        if fmt == "ndc_isotropic":
            s = min(H0, W0) / 2.0
            sx = sy = s
        else:
            sx, sy = W0 / 2.0, H0 / 2.0
        focal = [K_px[0, 0] / sx, K_px[1, 1] / sy]
        principal = [
            (W0 / 2.0 - K_px[0, 2]) / sx,
            (H0 / 2.0 - K_px[1, 2]) / sy,
        ]
        frames.append({
            "sequence_name": "106_12345_6789",
            "frame_number": i,
            "image": {"path": ipath, "size": [H0, W0]},
            "depth": {"path": dpath, "scale_adjustment": 1.0,
                      "mask_path": None},
            "viewpoint": {
                "R": R_pt3d.tolist(),
                "T": T_pt3d.tolist(),
                "focal_length": focal,
                "principal_point": principal,
                "intrinsics_format": fmt,
            },
        })
    with gzip.open(os.path.join(cat, "frame_annotations.jgz"), "wt") as f:
        json.dump(frames, f)
    return seq, K_px, R_cv_list, t_cv_list


@pytest.mark.parametrize("fmt", ["ndc_isotropic", "ndc_norm_image_bounds"])
def test_co3d_reader_round_trip(tmp_path, fmt):
    seq, K_px, R_cv, t_cv, = _write_co3d(str(tmp_path), fmt)
    assert detect_scene_format(seq) == "co3d"
    images, ex, Kr, depths, masks, d_idx, c_idx = load_co3d_sequence(
        seq, target_size=TARGET
    )
    assert images.shape[0] == 2 and c_idx == [0, 1] and d_idx == [0, 1]
    # recovered extrinsics == the original OpenCV w2c
    for i in range(2):
        np.testing.assert_allclose(ex[0, i, :, :3], R_cv[i], atol=1e-6)
        np.testing.assert_allclose(ex[0, i, :, 3], t_cv[i], atol=1e-6)
    # recovered intrinsics == pixel K rescaled by the canonical resize
    np.testing.assert_allclose(
        Kr[0, 0, 0, 0], K_px[0, 0] * TARGET / W0, rtol=1e-5
    )
    # fp16-packed depth decodes to metres
    vals = depths[0, 0][masks[0, 0] > 0]
    assert 0.4 < vals.mean() < 2.1


def test_ndc_pixel_round_trip_unit():
    for fmt in ("ndc_isotropic", "ndc_norm_image_bounds"):
        K = _pt3d_ndc_to_pixel_K(
            np.array([2.0, 2.2]), np.array([0.05, -0.03]), H0, W0, fmt
        )
        assert K[0, 0] > 0 and K[1, 1] > 0 and K[2, 2] == 1


def test_pt3d_pose_involution():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    T = rng.normal(size=3)
    flip = np.diag([-1.0, -1.0, 1.0])
    w2c = _pt3d_pose_to_opencv_w2c((flip @ Q).T, flip @ T)
    np.testing.assert_allclose(w2c[:, :3], Q, atol=1e-12)
    np.testing.assert_allclose(w2c[:, 3], T, atol=1e-12)


def test_scene_dataset_mixes_formats(tmp_path):
    """SceneDataset discovers ScanNet scenes next to example-layout ones and
    feeds both through one canonical pipeline."""
    from omnivggt_tpu.data.dataset import SceneDataset

    _write_scannet(str(tmp_path))
    ds = SceneDataset(str(tmp_path), views_per_sample=2, target_size=TARGET)
    assert len(ds) == 1
    batch = ds.sample(np.random.default_rng(0))
    assert batch["images"].shape[:2] == (1, 2)  # (B, S, H, W, 3)
    assert np.isfinite(batch["images"]).all()
    assert np.isfinite(batch["world_points"]).all()
