"""Head activation functions.

Semantics match /root/reference/omnivggt/heads/head_act.py:12-125:
  - activate_pose: per-component activation of the 9-dim pose encoding
  - activate_head: split dense head output into values + confidence
  - inverse_log_transform: sign(y) * expm1(|y|)
  - conf "expp1": 1 + exp(conf)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_log_transform(y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sign(y) * jnp.expm1(jnp.abs(y))


def base_pose_act(pose_enc: jnp.ndarray, act_type: str = "linear") -> jnp.ndarray:
    if act_type == "linear":
        return pose_enc
    if act_type == "inv_log":
        return inverse_log_transform(pose_enc)
    if act_type == "exp":
        return jnp.exp(pose_enc)
    if act_type == "relu":
        return jax.nn.relu(pose_enc)
    raise ValueError(f"Unknown act_type: {act_type}")


def activate_pose(
    pred_pose_enc: jnp.ndarray,
    trans_act: str = "linear",
    quat_act: str = "linear",
    fl_act: str = "linear",
) -> jnp.ndarray:
    """Activate [T(3), quat(4), fov(2)] components independently."""
    T = base_pose_act(pred_pose_enc[..., :3], trans_act)
    quat = base_pose_act(pred_pose_enc[..., 3:7], quat_act)
    fl = base_pose_act(pred_pose_enc[..., 7:], fl_act)
    return jnp.concatenate([T, quat, fl], axis=-1)


def activate_head(
    out: jnp.ndarray,
    activation: str = "norm_exp",
    conf_activation: str = "expp1",
):
    """Split a dense head output (..., H, W, C) [channels-last] into activated
    values (..., H, W, C-1) and confidence (..., H, W).

    Note: unlike the reference (which takes NCHW and permutes,
    head_act.py:61-112), this takes channels-last directly — the whole DPT head
    runs in NHWC on TPU.
    """
    xyz = out[..., :-1]
    conf = out[..., -1]

    if activation == "norm_exp":
        d = jnp.clip(jnp.linalg.norm(xyz, axis=-1, keepdims=True), min=1e-8)
        pts3d = xyz / d * jnp.expm1(d)
    elif activation == "norm":
        pts3d = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    elif activation == "exp":
        pts3d = jnp.exp(xyz)
    elif activation == "relu":
        pts3d = jax.nn.relu(xyz)
    elif activation == "inv_log":
        pts3d = inverse_log_transform(xyz)
    elif activation == "xy_inv_log":
        xy, z = xyz[..., :2], xyz[..., 2:]
        z = inverse_log_transform(z)
        pts3d = jnp.concatenate([xy * z, z], axis=-1)
    elif activation == "sigmoid":
        pts3d = jax.nn.sigmoid(xyz)
    elif activation == "linear":
        pts3d = xyz
    else:
        raise ValueError(f"Unknown activation: {activation}")

    if conf_activation == "expp1":
        conf_out = 1 + jnp.exp(conf)
    elif conf_activation == "expp0":
        conf_out = jnp.exp(conf)
    elif conf_activation == "sigmoid":
        conf_out = jax.nn.sigmoid(conf)
    else:
        raise ValueError(f"Unknown conf_activation: {conf_activation}")

    return pts3d, conf_out
