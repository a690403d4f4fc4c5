"""View selection: pairwise camera-distance ranking for training-data sampling.

Covers /root/reference/omnivggt/datasets/utils/image_ranking.py:9-140:
distance(i, j) = rotation_angle(R_i, R_j)/180 + lambda_t * ||t_i - t_j||,
optionally with camera centres normalised by their mean norm, then an argsort
ranking per row.

TPU-first: one vectorised jnp computation (einsum for all pairwise R_i^T R_j
traces — no NxNx3x3 intermediate) instead of the reference's chunked numpy
loops; a lax.map row-chunked variant bounds memory for N in the thousands.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def rotation_angle_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle in degrees between two rotation matrices (3, 3)."""
    R = R1.T @ R2
    val = jnp.clip((jnp.trace(R) - 1) / 2, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(val))


def pairwise_extrinsic_distance(
    extrinsics: jnp.ndarray, lambda_t: float = 1.0, row_chunk: int = 0
) -> jnp.ndarray:
    """(N, 4, 4) or (N, 3, 4) extrinsics -> (N, N) distances.

    trace(R_i^T R_j) = sum_kl R_i[k,l] * R_j[k,l], so the full pairwise trace
    matrix is a single (N, 9) @ (9, N) matmul — MXU-friendly, no (N, N, 3, 3)
    intermediate.
    """
    R = extrinsics[:, :3, :3].astype(jnp.float32)
    t = extrinsics[:, :3, 3].astype(jnp.float32)
    Rf = R.reshape(-1, 9)

    def rows(Rf_chunk, t_chunk):
        traces = Rf_chunk @ Rf.T  # (c, N)
        val = jnp.clip((traces - 1) / 2, -1.0, 1.0)
        rot = jnp.degrees(jnp.arccos(val)) / 180.0
        d2 = (
            jnp.sum(t_chunk**2, -1)[:, None]
            - 2 * t_chunk @ t.T
            + jnp.sum(t**2, -1)[None, :]
        )
        trans = jnp.sqrt(jnp.maximum(d2, 0.0))
        return rot + lambda_t * trans

    N = R.shape[0]
    if row_chunk and N > row_chunk and N % row_chunk == 0:
        out = jax.lax.map(
            lambda args: rows(*args),
            (
                Rf.reshape(N // row_chunk, row_chunk, 9),
                t.reshape(N // row_chunk, row_chunk, 3),
            ),
        )
        return out.reshape(N, N)
    return rows(Rf, t)


@partial(jax.jit, static_argnames=("lambda_t", "normalize"))
def _ranking_impl(extrinsics, lambda_t: float, normalize: bool):
    if normalize:
        centers = extrinsics[:, :3, 3]
        avg_scale = jnp.mean(jnp.linalg.norm(centers, axis=1))
        # pure-rotation captures have all centres at the origin — dividing
        # by 0 would NaN every distance and scramble the ranking
        avg_scale = jnp.where(avg_scale > 0, avg_scale, 1.0)
        extrinsics = extrinsics.at[:, :3, 3].divide(avg_scale)
    dists = pairwise_extrinsic_distance(extrinsics, lambda_t)
    return jnp.argsort(dists, axis=1), dists


def compute_ranking(
    extrinsics, lambda_t: float = 1.0, normalize: bool = True, batched: bool = True
):
    """(ranking (N, N) int, dists (N, N)) — rows sorted nearest-first.
    `batched` kept for API compatibility (always vectorised here)."""
    del batched
    ranking, dists = _ranking_impl(
        jnp.asarray(extrinsics, jnp.float32), lambda_t, normalize
    )
    return np.asarray(ranking), np.asarray(dists)
