"""Geometry / codec parity vs the PyTorch reference (SURVEY.md §4 plan)."""

import numpy as np
import pytest

import jax.numpy as jnp

from omnivggt_tpu.utils import geometry as G
from tests.reference_util import install_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def torch_ref():
    install_reference()
    import torch  # noqa
    from omnivggt.utils import rotation, pose_enc
    from omnivggt.utils import geometry as tgeo

    return rotation, pose_enc, tgeo


def _rand_rotations(n=7, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def test_quat_mat_roundtrip():
    q = _rand_rotations()
    m = G.quat_to_mat(jnp.asarray(q))
    q2 = np.asarray(G.mat_to_quat(m))
    # standardised sign: compare up to the canonical form
    q_std = np.where(q[:, 3:4] < 0, -q, q)
    np.testing.assert_allclose(q2, q_std, atol=1e-5)


def test_quat_mat_parity(torch_ref):
    import torch

    rotation, _, _ = torch_ref
    q = _rand_rotations(11, seed=3)
    m_t = rotation.quat_to_mat(torch.from_numpy(q)).numpy()
    m_j = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    np.testing.assert_allclose(m_t, m_j, atol=1e-6)
    q_t = rotation.mat_to_quat(torch.from_numpy(m_t)).numpy()
    q_j = np.asarray(G.mat_to_quat(jnp.asarray(m_j)))
    np.testing.assert_allclose(q_t, q_j, atol=1e-6)


def test_se3_inverse_parity(torch_ref):
    import torch

    _, _, tgeo = torch_ref
    q = _rand_rotations(5, seed=1)
    se3 = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    se3[:, :3, :3] = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    se3[:, :3, 3] = np.random.default_rng(2).normal(size=(5, 3)).astype(np.float32)
    inv_t = tgeo.closed_form_inverse_se3(torch.from_numpy(se3)).numpy()
    inv_j = np.asarray(G.closed_form_inverse_se3(jnp.asarray(se3)))
    np.testing.assert_allclose(inv_t, inv_j, atol=1e-6)
    # inverse really inverts
    np.testing.assert_allclose(
        np.einsum("nij,njk->nik", se3, inv_j), np.tile(np.eye(4), (5, 1, 1)), atol=1e-5
    )


def test_pose_encoding_roundtrip_and_parity(torch_ref):
    import torch

    _, pose_enc, _ = torch_ref
    rng = np.random.default_rng(4)
    q = _rand_rotations(6, seed=5)
    ex = np.zeros((1, 6, 3, 4), np.float32)
    ex[0, :, :3, :3] = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    ex[0, :, :3, 3] = rng.normal(size=(6, 3))
    K = np.zeros((1, 6, 3, 3), np.float32)
    K[..., 0, 0] = rng.uniform(200, 600, size=(1, 6))
    K[..., 1, 1] = rng.uniform(200, 600, size=(1, 6))
    K[..., 0, 2] = 259
    K[..., 1, 2] = 196
    K[..., 2, 2] = 1

    pe_t = pose_enc.extri_intri_to_pose_encoding(
        torch.from_numpy(ex), torch.from_numpy(K), (392, 518)
    ).numpy()
    pe_j = np.asarray(
        G.extri_intri_to_pose_encoding(jnp.asarray(ex), jnp.asarray(K), (392, 518))
    )
    np.testing.assert_allclose(pe_t, pe_j, atol=1e-5)

    ex_t, K_t = pose_enc.pose_encoding_to_extri_intri(torch.from_numpy(pe_t), (392, 518))
    ex_j, K_j = G.pose_encoding_to_extri_intri(jnp.asarray(pe_j), (392, 518))
    np.testing.assert_allclose(ex_t.numpy(), np.asarray(ex_j), atol=1e-5)
    np.testing.assert_allclose(K_t.numpy(), np.asarray(K_j), atol=1e-2)
    # decode really roundtrips the rotation
    np.testing.assert_allclose(np.asarray(ex_j), ex, atol=1e-5)


def test_normalize_extrinsics_parity(torch_ref):
    import torch

    install_reference()
    from omnivggt.models.omnivggt_aggregator import ZeroAggregator

    q = _rand_rotations(5, seed=7)
    ex = np.zeros((2, 5, 3, 4), np.float32)
    ex[:, :, :3, :3] = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    ex[:, :, :3, 3] = np.random.default_rng(8).normal(size=(2, 5, 3)) * 3

    class _D:
        pass

    ne_t = ZeroAggregator.normalize_extrinsics(_D(), torch.from_numpy(ex.copy())).numpy()
    ne_j = np.asarray(G.normalize_extrinsics(jnp.asarray(ex)))
    np.testing.assert_allclose(ne_t, ne_j, atol=2e-5, rtol=1e-4)


def test_masked_normalize_extrinsics_subset(torch_ref):
    """Masked normalisation over a subset == reference normalisation of the
    gathered subset."""
    import torch

    from omnivggt.models.omnivggt_aggregator import ZeroAggregator
    from omnivggt_tpu.models.aggregator import masked_normalize_extrinsics

    q = _rand_rotations(6, seed=9)
    ex = np.zeros((1, 6, 3, 4), np.float32)
    ex[:, :, :3, :3] = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    ex[:, :, :3, 3] = np.random.default_rng(10).normal(size=(1, 6, 3)) * 2

    sel = [1, 3, 4]
    mask = np.zeros((1, 6), bool)
    mask[0, sel] = True

    class _D:
        pass

    ref = ZeroAggregator.normalize_extrinsics(
        _D(), torch.from_numpy(ex[:, sel].copy())
    ).numpy()
    ours = np.asarray(masked_normalize_extrinsics(jnp.asarray(ex), jnp.asarray(mask)))
    np.testing.assert_allclose(ours[:, sel], ref, atol=2e-5, rtol=1e-4)


def test_masked_normalize_depth_subset(torch_ref):
    import torch

    from omnivggt.models.omnivggt_aggregator import ZeroAggregator
    from omnivggt_tpu.models.aggregator import masked_normalize_depth

    rng = np.random.default_rng(11)
    depth = rng.uniform(0.1, 10, size=(2, 5, 8, 8, 1)).astype(np.float32)
    valid = (rng.uniform(size=(2, 5, 8, 8)) > 0.4).astype(np.float32)
    sel = [0, 2, 3]
    mask = np.zeros((2, 5), bool)
    mask[:, sel] = True

    class _D:
        pass

    ref = ZeroAggregator.normalize_depth(
        _D(), torch.from_numpy(depth[:, sel]), torch.from_numpy(valid[:, sel])
    ).numpy()
    ours = np.asarray(
        masked_normalize_depth(jnp.asarray(depth), jnp.asarray(valid), jnp.asarray(mask))
    )
    np.testing.assert_allclose(ours[:, sel], ref, atol=1e-5, rtol=1e-4)


def test_depth_unprojection_parity(torch_ref):
    _, _, tgeo = torch_ref
    rng = np.random.default_rng(12)
    depth = rng.uniform(0.5, 20, size=(3, 16, 16)).astype(np.float32)
    q = _rand_rotations(3, seed=13)
    ex = np.zeros((3, 3, 4), np.float32)
    ex[:, :3, :3] = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    ex[:, :3, 3] = rng.normal(size=(3, 3))
    K = np.zeros((3, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 20
    K[:, 0, 2] = K[:, 1, 2] = 8
    K[:, 2, 2] = 1

    ref = tgeo.unproject_depth_map_to_point_map(depth[..., None], ex, K)
    ours = G.unproject_depth_map_to_point_map(depth[..., None], ex, K)
    np.testing.assert_allclose(ref, ours, atol=1e-3, rtol=1e-4)
