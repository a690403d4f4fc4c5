"""Dataset utilities: image IO, cropping, view selection, augmentation."""

import os

import numpy as np
import pytest
import PIL.Image

import jax
import jax.numpy as jnp

from omnivggt_tpu.data import image_io as IIO
from omnivggt_tpu.data import cropping as CR
from omnivggt_tpu.data import view_selection as VS
from omnivggt_tpu.data import augmentation as AUG
from tests.reference_util import install_reference, reference_available

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

EXAMPLE_IMAGES = "/root/reference/example/office/images"


def _write_sintel_files(tmp_path):
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.1, 50, size=(12, 17)).astype(np.float32)
    dpt = tmp_path / "d.dpt"
    with open(dpt, "wb") as f:
        np.float32(IIO.TAG_FLOAT).tofile(f)
        np.int32(17).tofile(f)
        np.int32(12).tofile(f)
        depth.tofile(f)

    M = np.diag([100.0, 110.0, 1.0])
    M[0, 2], M[1, 2] = 8, 6
    N = np.concatenate([np.eye(3), [[0.1], [0.2], [0.3]]], axis=1)
    cam = tmp_path / "c.cam"
    with open(cam, "wb") as f:
        np.float32(IIO.TAG_FLOAT).tofile(f)
        M.astype(np.float64).tofile(f)
        N.astype(np.float64).tofile(f)

    u = rng.normal(size=(12, 17)).astype(np.float32)
    v = rng.normal(size=(12, 17)).astype(np.float32)
    flo = tmp_path / "f.flo"
    interleaved = np.empty((12, 34), np.float32)
    interleaved[:, 0::2], interleaved[:, 1::2] = u, v
    with open(flo, "wb") as f:
        np.float32(IIO.TAG_FLOAT).tofile(f)
        np.int32(17).tofile(f)
        np.int32(12).tofile(f)
        interleaved.tofile(f)
    return depth, M, N, u, v, dpt, cam, flo


def test_sintel_readers_roundtrip(tmp_path):
    depth, M, N, u, v, dpt, cam, flo = _write_sintel_files(tmp_path)
    np.testing.assert_array_equal(IIO.depth_read(str(dpt)), depth)
    M2, N2 = IIO.cam_read(str(cam))
    np.testing.assert_allclose(M2, M)
    np.testing.assert_allclose(N2, N)
    u2, v2 = IIO.flow_read(str(flo))
    np.testing.assert_array_equal(u2, u)
    np.testing.assert_array_equal(v2, v)


@needs_ref
def test_sintel_readers_parity(tmp_path):
    install_reference()
    from omnivggt.utils import image as TIMG

    depth, M, N, u, v, dpt, cam, flo = _write_sintel_files(tmp_path)
    np.testing.assert_array_equal(TIMG.depth_read(str(dpt)), IIO.depth_read(str(dpt)))
    tm, tn = TIMG.cam_read(str(cam))
    om, on = IIO.cam_read(str(cam))
    np.testing.assert_array_equal(tm, om)
    np.testing.assert_array_equal(tn, on)


@needs_ref
@pytest.mark.parametrize("size,square_ok", [(512, False), (224, False), (512, True)])
def test_crop_img_parity(size, square_ok):
    install_reference()
    from omnivggt.utils import image as TIMG

    path = sorted(os.listdir(EXAMPLE_IMAGES))[0]
    img = PIL.Image.open(os.path.join(EXAMPLE_IMAGES, path)).convert("RGB")
    ref = TIMG.crop_img(img.copy(), size, square_ok=square_ok)
    ours = IIO.crop_img(img.copy(), size, square_ok=square_ok)
    assert ref.size == ours.size
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


def test_load_images_folder():
    frames = IIO.load_images(EXAMPLE_IMAGES, size=512, verbose=False)
    assert len(frames) == 18
    f0 = frames[0]
    assert f0["img"].shape[0] == 1 and f0["img"].shape[-1] == 3
    assert f0["img"].min() >= 0 and f0["img"].max() <= 1
    assert f0["dynamic_mask"].shape == f0["mask"].shape


@needs_ref
def test_cropping_parity(tmp_path):
    install_reference()
    from omnivggt.datasets.utils import cropping as TCR

    rng = np.random.default_rng(1)
    img = PIL.Image.fromarray(
        (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8)
    )
    depth = rng.uniform(0.1, 10, size=(60, 80)).astype(np.float32)
    K = np.array([[70.0, 0, 41.0], [0, 72.0, 31.0], [0, 0, 1]], np.float32)

    ri, rd, rk = TCR.rescale_image_depthmap(img.copy(), depth.copy(), K.copy(), (40, 30))
    oi, od, ok = CR.rescale_image_depthmap(img.copy(), depth.copy(), K.copy(), (40, 30))
    assert ri.size == oi.size
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(oi))
    np.testing.assert_array_equal(rd, od)
    np.testing.assert_allclose(rk, ok, atol=1e-6)

    ri, rd, rk = TCR.center_crop_image_depthmap(img.copy(), depth.copy(), K.copy(), 0.7)
    oi, od, ok = CR.center_crop_image_depthmap(img.copy(), depth.copy(), K.copy(), 0.7)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(oi))
    np.testing.assert_array_equal(rd, od)
    np.testing.assert_allclose(rk, ok, atol=1e-6)

    rk = TCR.camera_matrix_of_crop(K.copy(), (80, 60), (64, 48), scaling=0.9)
    ok = CR.camera_matrix_of_crop(K.copy(), (80, 60), (64, 48), scaling=0.9)
    np.testing.assert_allclose(rk, ok, atol=1e-6)


@needs_ref
def test_view_selection_parity():
    install_reference()
    from omnivggt.datasets.utils import image_ranking as TIR
    from omnivggt_tpu.utils import geometry as G

    rng = np.random.default_rng(2)
    q = rng.normal(size=(10, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    E = np.tile(np.eye(4, dtype=np.float32), (10, 1, 1))
    E[:, :3, :3] = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    E[:, :3, 3] = rng.normal(size=(10, 3)) * 2

    rank_t, dists_t = TIR.compute_ranking(E.copy(), lambda_t=1.0, normalize=True)
    rank_o, dists_o = VS.compute_ranking(E.copy(), lambda_t=1.0, normalize=True)
    np.testing.assert_allclose(dists_t, dists_o, atol=1e-3)
    # argsort ties can differ at machine eps; check distances sorted per rank agree
    np.testing.assert_allclose(
        np.take_along_axis(dists_t, rank_t, 1),
        np.take_along_axis(dists_o, rank_o, 1),
        atol=1e-3,
    )


def test_augmentation_properties():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    aug = AUG.make_augmentation(gau_blur=True)
    key = jax.random.PRNGKey(0)
    out1 = aug(key, img)
    out2 = aug(key, img)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))  # deterministic per key
    out3 = aug(jax.random.PRNGKey(1), img)
    assert np.abs(np.asarray(out3) - np.asarray(out1)).max() > 0  # varies per key
    assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0

    # grayscale output has equal channels
    g = AUG.to_grayscale(img)
    np.testing.assert_allclose(np.asarray(g[..., 0]), np.asarray(g[..., 1]))

    # hue round trip: shifting by 0 is identity
    h = AUG.adjust_hue(img, 0.0)
    np.testing.assert_allclose(np.asarray(h), np.asarray(img), atol=1e-5)
