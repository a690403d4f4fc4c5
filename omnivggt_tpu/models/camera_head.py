"""Iterative camera pose refinement head.

Mirrors /root/reference/omnivggt/heads/camera_head.py:19-162: takes the camera
token (index 0) of the LAST aggregated layer, then runs `num_iterations` of
DiT-style adaLN-modulated refinement through a 4-block transformer trunk,
predicting a delta on the 9-dim absT_quaR_FoV encoding each iteration (with a
stop-gradient on the previous estimate, camera_head.py:126).

Always runs in fp32 (the reference wraps heads in autocast(enabled=False),
models/omnivggt.py:45). The refinement loop is a `lax.scan` over iterations
(same weights each step), emitting the activated pose encoding per iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omnivggt_tpu.config import CameraHeadConfig
from omnivggt_tpu.ops import layers as L
from omnivggt_tpu.ops.activations import activate_pose


def init(key, cfg: CameraHeadConfig):
    ks = jax.random.split(key, 6)
    D = cfg.dim_in
    return {
        "trunk": jax.vmap(
            lambda k: L.block_init(
                k,
                D,
                cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                init_values=cfg.init_values,
            )
        )(jax.random.split(ks[0], cfg.trunk_depth)),
        "token_norm": L.layer_norm_init(D),
        "trunk_norm": L.layer_norm_init(D),
        "empty_pose_tokens": jnp.zeros((1, 1, cfg.target_dim), jnp.float32),
        "embed_pose": L.linear_init(ks[1], cfg.target_dim, D),
        "poseLN_modulation": L.linear_init(ks[2], D, 3 * D),
        "pose_branch": {
            "fc1": L.linear_init(ks[3], D, D // 2),
            "fc2": L.linear_init(ks[4], D // 2, cfg.target_dim),
        },
    }


def apply(
    params,
    tokens_last: jnp.ndarray,
    cfg: CameraHeadConfig,
    num_valid_frames=None,
) -> jnp.ndarray:
    """Args:
        tokens_last: (B, S, P, 2C) final aggregated layer.
        num_valid_frames: optional traced int32 scalar — the trunk attends
            across the S frame tokens, so padded frames (bucketed serving)
            are masked out of its keys.

    Returns:
        (num_iterations, B, S, 9) activated pose encodings, one per iteration
        (the reference returns the same as a Python list).
    """
    # compute dtype follows the caller's cast (fp32 by default; bf16 when
    # config.head_dtype requests it); outputs are always fp32
    pose_tokens = tokens_last[:, :, 0]  # (B, S, D)
    pose_tokens = L.layer_norm(params["token_norm"], pose_tokens, cfg.ln_eps)
    B, S, D = pose_tokens.shape

    empty = jnp.broadcast_to(
        params["empty_pose_tokens"].astype(pose_tokens.dtype), (B, S, cfg.target_dim)
    )

    def trunk(x):
        def body(x, bp):
            return (
                L.block(
                    bp, x, num_heads=cfg.num_heads, ln_eps=cfg.ln_eps,
                    kv_valid=num_valid_frames,
                ),
                None,
            )
        x, _ = jax.lax.scan(body, x, params["trunk"])
        return x

    def iteration(pred_pose_enc, it):
        prev = jnp.where(it == 0, empty, jax.lax.stop_gradient(pred_pose_enc))
        module_input = L.linear(params["embed_pose"], prev)
        mod = L.linear(params["poseLN_modulation"], jax.nn.silu(module_input))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        normed = L.layer_norm(None, pose_tokens, cfg.adaln_eps)
        modulated = gate * (normed * (1 + scale) + shift) + pose_tokens
        out = trunk(modulated)
        delta = L.linear(
            params["pose_branch"]["fc2"],
            jax.nn.gelu(
                L.linear(
                    params["pose_branch"]["fc1"],
                    L.layer_norm(params["trunk_norm"], out, cfg.ln_eps),
                ),
                approximate=False,
            ),
        )
        pred = jnp.where(it == 0, delta, pred_pose_enc + delta)
        activated = activate_pose(
            pred.astype(jnp.float32),
            trans_act=cfg.trans_act, quat_act=cfg.quat_act, fl_act=cfg.fl_act,
        )
        return pred, activated

    _, activated_list = jax.lax.scan(
        iteration, jnp.zeros((B, S, cfg.target_dim), pose_tokens.dtype),
        jnp.arange(cfg.num_iterations),
    )
    return activated_list
