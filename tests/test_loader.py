"""Folder loader parity vs the reference's live loader
(visual_util.py:679-891) on the real example scenes."""

import os

import numpy as np
import pytest

from omnivggt_tpu.data import loader as L
from tests.reference_util import install_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

OFFICE = "/root/reference/example/office"
INFINIGEN = "/root/reference/example/infinigen"


@pytest.fixture(scope="module")
def ref_visual_util():
    install_reference()
    import sys
    import types

    # visual_util imports requests + matplotlib at module level; both exist.
    if "requests" not in sys.modules:
        try:
            import requests  # noqa
        except ImportError:
            sys.modules["requests"] = types.ModuleType("requests")
    import visual_util

    return visual_util


def _scene_dirs(scene):
    image_folder = os.path.join(scene, "images")
    camera_folder = os.path.join(scene, "cameras")
    depth_folder = os.path.join(scene, "depths")
    return (
        image_folder,
        camera_folder if os.path.isdir(camera_folder) else None,
        depth_folder if os.path.isdir(depth_folder) else None,
    )


@pytest.mark.parametrize("scene", [OFFICE, INFINIGEN])
def test_loader_parity(ref_visual_util, scene):
    if not os.path.isdir(os.path.join(scene, "images")):
        pytest.skip(f"{scene} has no images")
    image_folder, camera_folder, depth_folder = _scene_dirs(scene)

    ref = ref_visual_util.load_images_and_cameras(
        image_folder, camera_folder, depth_folder, target_size=518
    )
    ours = L.load_images_and_cameras(
        image_folder, camera_folder, depth_folder, target_size=518
    )
    r_imgs, r_ex, r_K, r_depth, r_mask, r_didx, r_cidx = ref
    o_imgs, o_ex, o_K, o_depth, o_mask, o_didx, o_cidx = ours

    # torch loader gives (S, 3, H, W); ours (S, H, W, 3)
    np.testing.assert_allclose(
        r_imgs.numpy().transpose(0, 2, 3, 1), o_imgs, atol=1e-6
    )
    np.testing.assert_allclose(r_ex.numpy(), o_ex, atol=1e-5)
    np.testing.assert_allclose(r_K.numpy(), o_K, atol=1e-4)
    np.testing.assert_allclose(r_depth.numpy(), o_depth, atol=1e-5)
    np.testing.assert_allclose(r_mask.numpy(), o_mask, atol=0)
    assert r_didx == o_didx
    assert r_cidx == o_cidx


def test_quickstart_loader_modes():
    imgs_dir = os.path.join(OFFICE, "images")
    paths = [
        os.path.join(imgs_dir, p) for p in sorted(os.listdir(imgs_dir))[:3]
    ]
    crop = L.load_and_preprocess_images(paths, mode="crop")
    assert crop.shape[1:] == (392, 518, 3) or crop.shape[1] <= 518
    pad = L.load_and_preprocess_images(paths, mode="pad")
    assert pad.shape[1:] == (518, 518, 3)
    # padding is white
    assert pad[:, :5].mean() > 0.9 or pad[:, -5:].mean() > 0.9

    with pytest.raises(ValueError):
        L.load_and_preprocess_images([], mode="crop")
    with pytest.raises(ValueError):
        L.load_and_preprocess_images(paths, mode="bogus")
