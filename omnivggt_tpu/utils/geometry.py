"""Geometry / camera math kernel library (pure JAX, CPU-testable).

Semantics match the reference:
  - quaternion codec: /root/reference/omnivggt/utils/rotation.py:14-138
    (scalar-last XYZW, best-conditioned mat->quat, sign standardisation)
  - SE3 closed-form inverse: /root/reference/omnivggt/utils/geometry.py:269-318
  - pose encoding absT_quaR_FoV: /root/reference/omnivggt/utils/pose_enc.py:11-130
  - depth unprojection: /root/reference/omnivggt/utils/geometry.py:151-266
  - extrinsics normalisation: /root/reference/omnivggt/models/omnivggt_aggregator.py:85-105

All functions are pure jnp, fully shape-polymorphic over leading batch dims where
noted, and safe under jit (no data-dependent control flow).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Quaternions (scalar-last XYZW)
# ---------------------------------------------------------------------------


def quat_to_mat(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Convert scalar-last (x, y, z, w) quaternions (..., 4) to rotation
    matrices (..., 3, 3)."""
    i = quaternions[..., 0]
    j = quaternions[..., 1]
    k = quaternions[..., 2]
    r = quaternions[..., 3]
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a zero subgradient at x == 0."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), jnp.zeros_like(x))


def standardize_quaternion(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real (last) component is non-negative."""
    return jnp.where(quaternions[..., 3:4] < 0, -quaternions, quaternions)


def mat_to_quat(matrix: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices (..., 3, 3) to scalar-last quaternions (..., 4).

    Numerically robust: evaluates all four quaternion candidates and picks the
    best-conditioned one (largest |q| denominator), then standardises the sign.
    """
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [m[..., i] for i in range(9)]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # desired quaternion (r, i, j, k order) scaled by each of r, i, j, k
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]

    # rijk -> ijkr (scalar-last)
    out = out[..., jnp.array([1, 2, 3, 0])]
    return standardize_quaternion(out)


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------


def closed_form_inverse_se3(se3: jnp.ndarray) -> jnp.ndarray:
    """Invert a batch (..., 3|4, 4) of SE3 matrices in closed form.

    Returns (..., 4, 4) with [R^T | -R^T t] on top and [0 0 0 1] below.
    """
    if se3.shape[-2:] not in ((4, 4), (3, 4)):
        raise ValueError(f"se3 must be (...,4,4) or (...,3,4), got {se3.shape}.")
    R = se3[..., :3, :3]
    T = se3[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top_right = -Rt @ T
    top = jnp.concatenate([Rt, top_right], axis=-1)  # (...,3,4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def expand_extrinsic_to_homog(extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Pad (..., 3, 4) extrinsics to homogeneous (..., 4, 4)."""
    bottom = jnp.zeros_like(extrinsics[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([extrinsics, bottom], axis=-2)


def normalize_extrinsics(extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Re-base a batch of world-to-camera extrinsics to the first camera and
    rescale translations by the mean camera distance to that camera.

    Args:
        extrinsics: (B, S, 3, 4) world-to-camera matrices.

    Returns:
        (B, S, 3, 4) normalised extrinsics.

    Matches omnivggt_aggregator.py:85-105 (incl. its S==1 no-rescale branch).
    """
    B, S = extrinsics.shape[:2]
    homog = expand_extrinsic_to_homog(extrinsics)  # (B,S,4,4)
    first_inv = closed_form_inverse_se3(homog[:, 0])  # (B,4,4)
    new_extrinsics = homog @ first_inv[:, None]  # (B,S,4,4)

    if S > 1:
        cam_centers = new_extrinsics[:, :, :3, 3]  # (B,S,3)
        ref_cam = cam_centers[:, 0:1, :]
        rel_distances = jnp.linalg.norm(cam_centers - ref_cam, axis=-1)[:, 1:]
        scale = jnp.clip(jnp.mean(rel_distances, axis=1, keepdims=True), min=1e-6)
        new_t = new_extrinsics[:, :, :3, 3] / scale[..., None]
        new_extrinsics = new_extrinsics.at[:, :, :3, 3].set(new_t)
    return new_extrinsics[:, :, :3]


# ---------------------------------------------------------------------------
# Pose encoding: absT_quaR_FoV (9-dim)
# ---------------------------------------------------------------------------


def extri_intri_to_pose_encoding(
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_size_hw,
    pose_encoding_type: str = "absT_quaR_FoV",
) -> jnp.ndarray:
    """Encode (B,S,3,4) w2c extrinsics + (B,S,3,3) intrinsics into (B,S,9):
    [T(3), quat xyzw(4), fov_h, fov_w]."""
    if pose_encoding_type != "absT_quaR_FoV":
        raise NotImplementedError(pose_encoding_type)
    R = extrinsics[..., :3, :3]
    T = extrinsics[..., :3, 3]
    quat = mat_to_quat(R)
    H, W = image_size_hw
    fov_h = 2 * jnp.arctan((H / 2) / intrinsics[..., 1, 1])
    fov_w = 2 * jnp.arctan((W / 2) / intrinsics[..., 0, 0])
    return jnp.concatenate(
        [T, quat, fov_h[..., None], fov_w[..., None]], axis=-1
    ).astype(jnp.float32)


def pose_encoding_to_extri_intri(
    pose_encoding: jnp.ndarray,
    image_size_hw,
    pose_encoding_type: str = "absT_quaR_FoV",
    build_intrinsics: bool = True,
):
    """Decode a (B,S,9) pose encoding into (B,S,3,4) extrinsics and, optionally,
    (B,S,3,3) intrinsics with the principal point at the image centre."""
    if pose_encoding_type != "absT_quaR_FoV":
        raise NotImplementedError(pose_encoding_type)
    T = pose_encoding[..., :3]
    quat = pose_encoding[..., 3:7]
    fov_h = pose_encoding[..., 7]
    fov_w = pose_encoding[..., 8]

    R = quat_to_mat(quat)
    extrinsics = jnp.concatenate([R, T[..., None]], axis=-1)

    intrinsics = None
    if build_intrinsics:
        H, W = image_size_hw
        fy = (H / 2.0) / jnp.tan(fov_h / 2.0)
        fx = (W / 2.0) / jnp.tan(fov_w / 2.0)
        zeros = jnp.zeros_like(fx)
        ones = jnp.ones_like(fx)
        row0 = jnp.stack([fx, zeros, ones * (W / 2)], axis=-1)
        row1 = jnp.stack([zeros, fy, ones * (H / 2)], axis=-1)
        row2 = jnp.stack([zeros, zeros, ones], axis=-1)
        intrinsics = jnp.stack([row0, row1, row2], axis=-2)
    return extrinsics, intrinsics


# ---------------------------------------------------------------------------
# Depth unprojection
# ---------------------------------------------------------------------------


def depth_to_cam_coords_points(depth_map: jnp.ndarray, intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Pinhole unprojection: (H, W) depth + (3, 3) K -> (H, W, 3) camera coords."""
    H, W = depth_map.shape
    fu, fv = intrinsic[0, 0], intrinsic[1, 1]
    cu, cv = intrinsic[0, 2], intrinsic[1, 2]
    u = jnp.arange(W, dtype=depth_map.dtype)[None, :]
    v = jnp.arange(H, dtype=depth_map.dtype)[:, None]
    x_cam = (u - cu) * depth_map / fu
    y_cam = (v - cv) * depth_map / fv
    return jnp.stack(
        [x_cam, y_cam, depth_map], axis=-1
    ).astype(jnp.float32)


def depth_to_world_coords_points(
    depth_map: jnp.ndarray,
    extrinsic: jnp.ndarray,
    intrinsic: jnp.ndarray,
    z_far: float = 100.0,
    eps: float = 1e-8,
):
    """(H, W) depth + (3, 4) w2c extrinsic + (3, 3) K -> world points, cam points,
    and a valid mask. The extrinsic is camera-from-world and is inverted here."""
    point_mask = depth_map > eps
    if z_far > 0:
        point_mask = point_mask & (depth_map < z_far)
    cam_coords = depth_to_cam_coords_points(depth_map, intrinsic)
    cam_to_world = closed_form_inverse_se3(extrinsic[None])[0]
    R = cam_to_world[:3, :3]
    t = cam_to_world[:3, 3]
    world_coords = cam_coords @ R.T + t
    return world_coords, cam_coords, point_mask


def unproject_depth_map_to_point_map(
    depth_map, extrinsics_cam, intrinsics_cam
) -> np.ndarray:
    """Batch unprojection: (S, H, W[, 1]) depth + (S, 3, 4) + (S, 3, 3) ->
    (S, H, W, 3) world points. Accepts numpy or jnp; returns numpy."""
    depth_map = jnp.asarray(depth_map)
    if depth_map.ndim == 4:
        depth_map = depth_map[..., 0]
    world = jax.vmap(
        lambda d, e, k: depth_to_world_coords_points(d, e, k)[0]
    )(depth_map, jnp.asarray(extrinsics_cam), jnp.asarray(intrinsics_cam))
    return np.asarray(world)


# ---------------------------------------------------------------------------
# Intrinsics conventions
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Point-cloud normalisation & matching (training-era surface,
# /root/reference/omnivggt/utils/geometry.py:347-557)
# ---------------------------------------------------------------------------


def normalize_pointcloud(
    pts: jnp.ndarray,
    norm_mode: str = "avg_dis",
    valid: Optional[jnp.ndarray] = None,
    ret_factor: bool = False,
):
    """Renormalise (B, H, W, 3) point maps by a distance statistic:
    avg_dis / avg_log1p / median_dis / sqrt_dis over valid points."""
    assert pts.ndim >= 3 and pts.shape[-1] == 3
    mode, dis_mode = norm_mode.split("_")
    B = pts.shape[0]
    flat = pts.reshape(B, -1, 3)
    if valid is not None:
        vmask = valid.reshape(B, -1)
    else:
        vmask = jnp.ones(flat.shape[:2], bool)

    dis = jnp.linalg.norm(jnp.where(vmask[..., None], flat, 0.0), axis=-1)
    if dis_mode == "log1p":
        dis = jnp.log1p(dis)
    elif dis_mode == "warp-log1p":
        log_dis = jnp.log1p(dis)
        warp = log_dis / jnp.clip(dis, min=1e-8)
        pts = pts * warp.reshape(pts.shape[:-1])[..., None]
        dis = log_dis
    elif dis_mode != "dis":
        raise ValueError(f"bad {dis_mode=}")

    nnz = jnp.sum(vmask, axis=1)
    if mode == "avg":
        factor = jnp.sum(dis * vmask, axis=1) / (nnz + 1e-8)
    elif mode == "median":
        # torch nanmedian semantics: the LOWER of the two middle values
        dn = jnp.where(vmask, dis, jnp.inf)
        sorted_dis = jnp.sort(dn, axis=1)
        idx = jnp.maximum((nnz - 1) // 2, 0)
        factor = jnp.take_along_axis(sorted_dis, idx[:, None], axis=1)[:, 0]
    elif mode == "sqrt":
        factor = (jnp.sum(jnp.sqrt(dis) * vmask, axis=1) / (nnz + 1e-8)) ** 2
    else:
        raise ValueError(f"bad {mode=}")

    factor = jnp.clip(factor, min=1e-8).reshape((B,) + (1,) * (pts.ndim - 1))
    res = pts / factor
    if ret_factor:
        return res, factor
    return res


def find_reciprocal_matches(P1: np.ndarray, P2: np.ndarray):
    """Mutual nearest-neighbour matching between two point sets via KD-trees.
    Returns (reciprocal_in_P2 bool (N2,), nn2_in_P1 int (N2,), n_matches)."""
    from scipy.spatial import KDTree

    tree1 = KDTree(P1)
    tree2 = KDTree(P2)
    _, nn1_in_P2 = tree2.query(P1, workers=-1)
    _, nn2_in_P1 = tree1.query(P2, workers=-1)
    reciprocal_in_P2 = nn1_in_P2[nn2_in_P1] == np.arange(len(nn2_in_P1))
    return reciprocal_in_P2, nn2_in_P1, int(reciprocal_in_P2.sum())


def get_med_dist_between_poses(poses) -> float:
    from scipy.spatial.distance import pdist

    return float(np.median(pdist([np.asarray(p)[:3, 3] for p in poses])))


def geotrf(Trf, pts, ncol: Optional[int] = None, norm: float = 0):
    """Apply a (batched) homogeneous transformation to points of shape
    (..., 2|3): rotation(+translation) if Trf is one column wider than the
    points, plain linear map if square; optional projective normalisation onto
    the z=norm plane."""
    Trf = jnp.asarray(Trf)
    pts = jnp.asarray(pts)
    output_shape = pts.shape[:-1]
    ncol = ncol or pts.shape[-1]

    if Trf.ndim >= 3:
        n = Trf.ndim - 2
        assert Trf.shape[:n] == pts.shape[:n], "batch size does not match"
        Trf = Trf.reshape(-1, Trf.shape[-2], Trf.shape[-1])
        if pts.ndim > Trf.ndim:
            pts = pts.reshape(Trf.shape[0], -1, pts.shape[-1])
        elif pts.ndim == 2:
            pts = pts[:, None, :]

    if pts.shape[-1] + 1 == Trf.shape[-1]:
        T = jnp.swapaxes(Trf, -1, -2)
        pts = pts @ T[..., :-1, :] + T[..., -1:, :]
    elif pts.shape[-1] == Trf.shape[-1]:
        pts = pts @ jnp.swapaxes(Trf, -1, -2)
    else:
        pts = jnp.swapaxes(Trf @ pts.T, -1, -2)

    if norm:
        pts = pts / pts[..., -1:]
        if norm != 1:
            pts = pts * norm

    return pts[..., :ncol].reshape(*output_shape, ncol)


def colmap_to_opencv_intrinsics(K: np.ndarray) -> np.ndarray:
    """Shift the principal point by -0.5 px (Colmap pixel-centre convention ->
    OpenCV)."""
    K = np.array(K, copy=True)
    K[..., 0, 2] -= 0.5
    K[..., 1, 2] -= 0.5
    return K


def opencv_to_colmap_intrinsics(K: np.ndarray) -> np.ndarray:
    K = np.array(K, copy=True)
    K[..., 0, 2] += 0.5
    K[..., 1, 2] += 0.5
    return K
