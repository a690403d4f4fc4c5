"""Training losses for OmniVGGT.

The reference releases no training code (/root/reference/README.md:201-205);
these losses follow the VGGT recipe the model family was trained with
(arXiv 2511.10560 §training, VGGT arXiv 2503.11651):

  - camera loss: L1 on the 9-dim absT_quaR_FoV encoding against the
    scene-normalised ground truth, summed over the camera head's refinement
    iterations with exponentially increasing weight (later iterates matter
    more).
  - dense losses (depth, world points): confidence-weighted L1,
        conf * |pred - gt| - alpha * log(conf)
    over valid pixels — the standard aleatoric-confidence objective the
    predicted `expp1` confidences parameterise.

All reductions are mask-aware and safe for empty masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from omnivggt_tpu.utils import geometry as G


def camera_loss(
    pose_enc_list: jnp.ndarray,
    gt_extrinsics: jnp.ndarray,
    gt_intrinsics: jnp.ndarray,
    image_size_hw,
    gamma: float = 0.8,
    valid: jnp.ndarray = None,
) -> jnp.ndarray:
    """pose_enc_list: (T, B, S, 9) iterates; gt: (B,S,3,4)/(B,S,3,3);
    valid: optional (S,) or (B,S) frame mask — frames without camera GT are
    excluded (their loader placeholders are zero matrices whose encodings are
    garbage) and the normalisation rebases to the first VALID camera."""
    B, S = gt_extrinsics.shape[:2]
    if valid is None:
        gt_norm = G.normalize_extrinsics(gt_extrinsics)
        gt_enc = G.extri_intri_to_pose_encoding(gt_norm, gt_intrinsics, image_size_hw)
        w_frame = jnp.ones((B, S))
    else:
        from omnivggt_tpu.models.aggregator import masked_normalize_extrinsics

        valid = jnp.asarray(valid)
        if valid.ndim == 1:
            valid = jnp.broadcast_to(valid[None], (B, S))
        valid = valid.astype(bool)
        m4 = valid[:, :, None, None]
        ex = jnp.where(m4, gt_extrinsics, jnp.broadcast_to(jnp.eye(3, 4), gt_extrinsics.shape))
        K = jnp.where(m4, gt_intrinsics, jnp.broadcast_to(jnp.eye(3), gt_intrinsics.shape))
        gt_norm = masked_normalize_extrinsics(ex, valid)
        gt_enc = G.extri_intri_to_pose_encoding(gt_norm, K, image_size_hw)
        w_frame = valid.astype(jnp.float32)

    T = pose_enc_list.shape[0]
    weights = gamma ** jnp.arange(T - 1, -1, -1)  # last iterate weight 1
    err = jnp.mean(jnp.abs(pose_enc_list - gt_enc[None]), axis=-1)  # (T,B,S)
    denom = jnp.maximum(jnp.sum(w_frame), 1.0)
    per_iter = jnp.sum(err * w_frame[None], axis=(1, 2)) / denom
    return jnp.sum(weights * per_iter)


def conf_weighted_l1(
    pred: jnp.ndarray,
    conf: jnp.ndarray,
    gt: jnp.ndarray,
    valid: jnp.ndarray,
    alpha: float = 0.2,
) -> jnp.ndarray:
    """conf * |pred - gt| - alpha * log(conf) over valid pixels.

    pred: (..., C); conf: (...); gt: (..., C); valid: (...)."""
    err = jnp.sum(jnp.abs(pred - gt), axis=-1)
    loss = conf * err - alpha * jnp.log(conf)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(loss * valid) / denom


def total_loss(
    predictions,
    batch,
    image_size_hw,
    *,
    w_camera: float = 1.0,
    w_depth: float = 1.0,
    w_point: float = 1.0,
):
    """Combine camera/depth/point losses from a prediction dict and a batch
    with keys: extrinsics (B,S,3,4), intrinsics (B,S,3,3),
    depth (B,S,H,W,1), depth_valid (B,S,H,W), world_points (B,S,H,W,3)."""
    losses = {}
    losses["camera"] = camera_loss(
        predictions["pose_enc_list"],
        batch["extrinsics"],
        batch["intrinsics"],
        image_size_hw,
        valid=batch.get("camera_valid"),
    )
    losses["depth"] = conf_weighted_l1(
        predictions["depth"],
        predictions["depth_conf"],
        batch["depth"],
        batch["depth_valid"],
    )
    losses["point"] = conf_weighted_l1(
        predictions["world_points"],
        predictions["world_points_conf"],
        batch["world_points"],
        # point supervision needs the camera that unprojected it; fall back to
        # depth validity for synthetic batches that provide dense points
        batch.get("point_valid", batch["depth_valid"]),
    )
    losses["total"] = (
        w_camera * losses["camera"]
        + w_depth * losses["depth"]
        + w_point * losses["point"]
    )
    return losses
