"""Trajectory evaluation: ATE (Sim3-aligned APE RMSE) and RPE (relative pose
error, translation + rotation RMSE).

Functional equivalent of the reference's evo-based toolkit
(/root/reference/omnivggt/utils/vo_eval.py:163-246) — evo is unavailable here,
so the metrics are implemented directly: Umeyama Sim(3) alignment + APE, and
delta-1 RPE, matching evo's definitions (`ape -r translation --align
--correct_scale`, `rpe -r translation/angle_deg --delta 1`).

Also includes the TUM trajectory I/O used by the reference
(vo_eval.py:286-294: `timestamp tx ty tz qx qy qz qw` per line).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from omnivggt_tpu.utils import geometry as G


def umeyama_sim3(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares Sim(3): find (s, R, t) minimising ||dst - (s R src + t)||.

    Args:
        src, dst: (N, 3).
    Returns:
        (s, R, t).
    """
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = np.trace(np.diag(D) @ S) / max(var_s, 1e-12)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def _positions_from_c2w(poses_c2w: np.ndarray) -> np.ndarray:
    return poses_c2w[:, :3, 3]


def ate_rmse(
    pred_c2w: np.ndarray, gt_c2w: np.ndarray, correct_scale: bool = True
) -> float:
    """Absolute trajectory error: RMSE of translation after Sim(3) (or SE(3))
    alignment. Poses are (N, 4, 4) camera-to-world."""
    p, g = _positions_from_c2w(pred_c2w), _positions_from_c2w(gt_c2w)
    s, R, t = umeyama_sim3(p, g, with_scale=correct_scale)
    aligned = (s * (R @ p.T)).T + t
    return float(np.sqrt(np.mean(np.sum((aligned - g) ** 2, axis=-1))))


def rpe(
    pred_c2w: np.ndarray, gt_c2w: np.ndarray, delta: int = 1
) -> Tuple[float, float]:
    """Relative pose error with frame delta: (trans RMSE, rot RMSE in deg)."""
    def rel(poses):
        return np.stack(
            [np.linalg.inv(poses[i]) @ poses[i + delta] for i in range(len(poses) - delta)]
        )

    rp, rg = rel(pred_c2w), rel(gt_c2w)
    err = np.stack([np.linalg.inv(a) @ b for a, b in zip(rp, rg)])
    trans_err = np.linalg.norm(err[:, :3, 3], axis=-1)
    cos_angle = np.clip((np.trace(err[:, :3, :3], axis1=1, axis2=2) - 1) / 2, -1, 1)
    rot_err_deg = np.rad2deg(np.arccos(cos_angle))
    return (
        float(np.sqrt(np.mean(trans_err**2))),
        float(np.sqrt(np.mean(rot_err_deg**2))),
    )


def eval_metrics(
    pred_c2w: np.ndarray, gt_c2w: np.ndarray
) -> Dict[str, float]:
    """The reference's headline trio (vo_eval.py:163-246): Sim3-aligned ATE
    RMSE + delta-1 RPE translation/rotation RMSE."""
    ate = ate_rmse(pred_c2w, gt_c2w, correct_scale=True)
    rpe_t, rpe_r = rpe(pred_c2w, gt_c2w, delta=1)
    return {"ate_rmse": ate, "rpe_trans_rmse": rpe_t, "rpe_rot_rmse_deg": rpe_r}


def pose_auc(
    pred_c2w: np.ndarray, gt_c2w: np.ndarray, thresholds=(5, 10, 30)
) -> Dict[str, float]:
    """AUC of max(rotation err, normalised translation-angle err) under
    thresholds in degrees — the pose AUC@30 style metric used as the accuracy
    north star (BASELINE.json)."""
    n = len(pred_c2w)
    errs = []
    for i in range(n):
        for j in range(i + 1, n):
            rel_p = np.linalg.inv(pred_c2w[i]) @ pred_c2w[j]
            rel_g = np.linalg.inv(gt_c2w[i]) @ gt_c2w[j]
            dR = rel_p[:3, :3] @ rel_g[:3, :3].T
            ang = np.rad2deg(
                np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            )
            tp, tg = rel_p[:3, 3], rel_g[:3, 3]
            denom = np.linalg.norm(tp) * np.linalg.norm(tg)
            if denom > 1e-8:
                tang = np.rad2deg(
                    np.arccos(np.clip(tp @ tg / denom, -1, 1))
                )
            else:
                tang = 0.0
            errs.append(max(ang, tang))
    errs = np.sort(np.asarray(errs))
    out = {}
    for th in thresholds:
        # normalised area under the cumulative accuracy curve up to threshold
        acc = np.array([np.mean(errs <= e) for e in np.linspace(0, th, 100)])
        out[f"auc@{th}"] = float(np.trapezoid(acc, dx=1.0 / 100))
    return out


# ---------------------------------------------------------------------------
# TUM-format trajectory I/O (vo_eval.py:286-294)
# ---------------------------------------------------------------------------


def save_trajectory_tum_format(poses_c2w: np.ndarray, path: str, timestamps=None):
    """Write `timestamp tx ty tz qx qy qz qw` lines."""
    import jax.numpy as jnp

    if timestamps is None:
        timestamps = np.arange(len(poses_c2w), dtype=np.float64)
    quats = np.asarray(G.mat_to_quat(jnp.asarray(poses_c2w[:, :3, :3])))
    with open(path, "w") as f:
        for ts, pose, q in zip(timestamps, poses_c2w, quats):
            t = pose[:3, 3]
            f.write(
                f"{ts} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n"
            )


def load_trajectory_tum_format(path: str):
    """Read TUM lines -> (poses_c2w (N,4,4), timestamps (N,))."""
    import jax.numpy as jnp

    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    ts = data[:, 0]
    t = data[:, 1:4]
    q = data[:, 4:8]  # qx qy qz qw (scalar-last, matches our codec)
    R = np.asarray(G.quat_to_mat(jnp.asarray(q.astype(np.float32))))
    poses = np.tile(np.eye(4), (len(data), 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = t
    return poses, ts
