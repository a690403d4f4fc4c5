"""Alternating frame/global attention aggregator with auxiliary-modality
injection (the reference's ZeroAggregator).

Reference semantics:
  - base alternating attention: /root/reference/omnivggt/models/aggregator.py:26-366
  - modality injection: /root/reference/omnivggt/models/omnivggt_aggregator.py:18-304
      * GT camera poses -> 9-dim absT_quaR_FoV encoding (after first-camera
        normalisation) -> per-group Linear(9,C) pose embedding -> zero-init
        Linear(C,C) adapter, injected at the input and re-injected after every
        frame block (group index+1). The adapter bias reaches *all* frames
        (adapter(0) = bias for rows without GT), matching
        omnivggt_aggregator.py:211,286-301.
      * GT depth -> per-scene mean-normalised (depth, mask) 2-channel patchify,
        injected once at the input; frames without GT depth get a learned
        placeholder token added to every patch position
        (omnivggt_aggregator.py:185-212).

TPU-first design choices (vs the reference's Python loop over 48 nn.Modules):
  - the 24 (frame, global) layer pairs run as ONE `lax.scan` over stacked
    parameters: one compiled body, 24x reuse, no 48-way unrolled HLO.
  - GT indices are dense boolean masks over frames, not dynamic index lists,
    so shapes stay static under jit (the reference scatters by index lists,
    omnivggt_aggregator.py:158-208).
  - only the intermediate layers the heads consume are materialised (a slot
    buffer written inside the scan), instead of all 24 [B,S,P,2C] tensors
    (models/aggregator.py:272-275 keeps every layer).
  - RoPE cos/sin tables are static trace-time constants (see ops/rope.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from omnivggt_tpu.config import AggregatorConfig
from omnivggt_tpu.models import dinov2
from omnivggt_tpu.ops import layers as L
from omnivggt_tpu.ops import rope as R
from omnivggt_tpu.utils import geometry as G

_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


class AuxInputs(NamedTuple):
    """Optional per-frame auxiliary modalities. Masks are dense booleans over
    the S frames (True = ground truth available for that frame)."""

    extrinsics: Optional[jnp.ndarray] = None  # (B, S, 3, 4) world-to-camera
    intrinsics: Optional[jnp.ndarray] = None  # (B, S, 3, 3)
    depth: Optional[jnp.ndarray] = None  # (B, S, H, W, 1)
    depth_valid: Optional[jnp.ndarray] = None  # (B, S, H, W) validity of pixels
    camera_mask: Optional[jnp.ndarray] = None  # (S,) or (B, S) bool
    depth_mask: Optional[jnp.ndarray] = None  # (S,) or (B, S) bool


def init(key, cfg: AggregatorConfig):
    ks = jax.random.split(key, 8)
    C = cfg.embed_dim
    G_ = cfg.num_groups

    if cfg.patch_embed == "conv":
        pe = L.patch_embed_init(ks[0], cfg.patch_size, 3, C)
    else:
        pe = dinov2.init(ks[0], cfg.backbone)

    def blocks(k):
        return jax.vmap(
            lambda kk: L.block_init(
                kk,
                C,
                cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                proj_bias=cfg.proj_bias,
                ffn_bias=cfg.ffn_bias,
                init_values=cfg.init_values,
                qk_norm=cfg.qk_norm,
            )
        )(jax.random.split(k, cfg.depth))

    pose_emb = jax.vmap(lambda k: L.linear_init(k, cfg.pose_hidden_dim, C))(
        jax.random.split(ks[3], G_)
    )

    return {
        "patch_embed": pe,
        "camera_token": jax.random.normal(ks[1], (1, 2, 1, C)) * 1e-6,
        "register_token": jax.random.normal(ks[2], (1, 2, cfg.num_register_tokens, C)) * 1e-6,
        "frame_blocks": blocks(ks[4]),
        "global_blocks": blocks(ks[5]),
        "pose_embeddings": pose_emb,
        # zero-initialised adapters (omnivggt_aggregator.py:70-72)
        "camera_adapters": {
            "w": jnp.zeros((G_, C, C), jnp.float32),
            "b": jnp.zeros((G_, C), jnp.float32),
        },
        "depth_placeholder": jnp.zeros((1, 1, C), jnp.float32),
        "depth_patch_embed": L.patch_embed_init(ks[6], cfg.patch_size, 2, C),
    }


def _expand_special_token(tok: jnp.ndarray, B: int, S: int, dtype) -> jnp.ndarray:
    """(1, 2, X, C) -> (B, S, X, C): slot 0 for the first frame, slot 1 for the
    rest (models/aggregator.py:343-366)."""
    X, C = tok.shape[2], tok.shape[3]
    tok = tok.astype(dtype)
    first = jnp.broadcast_to(tok[:, 0:1], (B, 1, X, C))
    others = jnp.broadcast_to(tok[:, 1:2], (B, S - 1, X, C))
    return jnp.concatenate([first, others], axis=1)


def masked_normalize_extrinsics(
    extrinsics: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked equivalent of the reference normalisation over the *selected*
    frames (omnivggt_aggregator.py:85-105): rebase to the first selected
    camera, rescale translations by the mean distance of the other selected
    cameras to it. Frames outside the mask still get transformed (their values
    are ignored downstream).

    Args:
        extrinsics: (B, S, 3, 4); mask: (B, S) bool.
    """
    B, S = extrinsics.shape[:2]
    idx0 = jnp.argmax(mask, axis=1)  # first selected frame per batch
    homog = G.expand_extrinsic_to_homog(extrinsics)
    first = jnp.take_along_axis(homog, idx0[:, None, None, None], axis=1)[:, 0]
    first_inv = G.closed_form_inverse_se3(first)
    new = homog @ first_inv[:, None]

    cam_centers = new[:, :, :3, 3]
    ref = jnp.take_along_axis(cam_centers, idx0[:, None, None], axis=1)
    dist = jnp.linalg.norm(cam_centers - ref, axis=-1)  # (B, S)
    excl = mask & (jnp.arange(S)[None, :] != idx0[:, None])
    cnt = jnp.sum(excl, axis=1)
    mean_dist = jnp.sum(dist * excl, axis=1) / jnp.maximum(cnt, 1)
    scale = jnp.where(cnt > 0, jnp.clip(mean_dist, min=1e-6), 1.0)
    new_t = new[:, :, :3, 3] / scale[:, None, None]
    new = new.at[:, :, :3, 3].set(new_t)
    return new[:, :, :3]


def masked_normalize_depth(
    depth: jnp.ndarray, valid: jnp.ndarray, frame_mask: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Masked equivalent of omnivggt_aggregator.py:107-128: per-batch mean over
    valid pixels of the selected frames, then depth / (mean + eps) * valid.

    Args:
        depth: (B, S, H, W, 1); valid: (B, S, H, W); frame_mask: (B, S) bool.
    """
    d = depth[..., 0]
    sel = valid * frame_mask[:, :, None, None]
    cnt = jnp.sum(sel, axis=(1, 2, 3))
    total = jnp.sum(d * sel, axis=(1, 2, 3))
    mean = total / jnp.maximum(cnt, 1.0)
    norm = jnp.where(cnt[:, None, None, None] > 0, d / (mean[:, None, None, None] + eps), 0.0)
    return (norm * valid)[..., None]


def _frame_mask(mask, B: int, S: int):
    """Normalise a camera/depth mask to (B, S) bool (or None)."""
    if mask is None:
        return None
    mask = jnp.asarray(mask)
    if mask.ndim == 1:
        mask = jnp.broadcast_to(mask[None, :], (B, S))
    return mask.astype(bool)


def compute_pose_encoding(
    aux: AuxInputs, image_size_hw: Tuple[int, int], camera_mask: jnp.ndarray
) -> jnp.ndarray:
    """(B, S, 9) pose encoding of the mask-normalised GT extrinsics. Rows
    without GT are computed from sanitised identity cameras (then masked out by
    the caller) so no NaN/Inf leaks into gradients."""
    B, S = camera_mask.shape
    eye34 = jnp.broadcast_to(jnp.eye(3, 4), (B, S, 3, 4))
    eyeK = jnp.broadcast_to(jnp.eye(3), (B, S, 3, 3))
    m4 = camera_mask[:, :, None, None]
    ex = jnp.where(m4, aux.extrinsics, eye34)
    K = jnp.where(m4, aux.intrinsics, eyeK)
    ex_n = masked_normalize_extrinsics(ex, camera_mask)
    return G.extri_intri_to_pose_encoding(ex_n, K, image_size_hw)


def apply(
    params,
    images: jnp.ndarray,
    cfg: AggregatorConfig,
    aux: Optional[AuxInputs] = None,
    *,
    output_layers: Tuple[int, ...],
    dtype=jnp.float32,
    attn_impl: str = "auto",
    sharding=None,
    remat=False,  # False | True/'full' | 'dots' checkpoint policy
    train_rng=None,
    num_valid_frames=None,
    allow_bounded: bool = True,
    approx_gelu: bool = False,
    int8_dense=False,
    int8_qk: bool = False,
    pad_tokens: bool = True,
):
    """Run the aggregator.

    Args:
        images: (B, S, H, W, 3) NHWC in [0, 1].
        output_layers: which of the `depth` layer outputs to materialise
            (indices into the reference's aggregated_tokens_list).
        train_rng: optional PRNGKey enabling train-time stochastic depth at
            cfg.drop_path_rate (None = eval: deterministic).
        num_valid_frames: optional traced int32 scalar — frames at positions
            >= num_valid_frames are shape padding: their tokens are masked out
            of the global-attention keys so they cannot influence real frames
            (exact bucketed serving). Frame attention and the patch embedder
            are per-frame and need no masking.

    Returns:
        (out_buffer, patch_start_idx): out_buffer has shape
        (len(output_layers), B, S, P, 2C) in `dtype`, entries ordered like
        `output_layers`.
    """
    B, S, H, W, _ = images.shape
    C = cfg.embed_dim
    psi = cfg.patch_start_idx
    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    n_patch = gh * gw
    P = psi + n_patch
    aux = aux or AuxInputs()

    frame_shard = sharding.frame_attn_shard if sharding is not None else None
    global_shard = sharding.global_attn_shard if sharding is not None else None

    mean = jnp.asarray(_RESNET_MEAN, dtype).reshape(1, 1, 1, 3)
    std = jnp.asarray(_RESNET_STD, dtype).reshape(1, 1, 1, 3)
    imgs = (images.reshape(B * S, H, W, 3).astype(dtype) - mean) / std
    if sharding is not None:
        imgs = sharding.constrain_rows(imgs)

    if cfg.patch_embed == "conv":
        patch_tokens = L.patch_embed(params["patch_embed"], imgs, cfg.patch_size)
    else:
        patch_tokens = dinov2.apply(
            params["patch_embed"], imgs, cfg.backbone, attn_impl=attn_impl,
            shard=frame_shard, approx_gelu=approx_gelu, int8_dense=int8_dense,
            int8_qk=int8_qk, pad_tokens=pad_tokens,
        )

    camera_token = _expand_special_token(params["camera_token"], B, S, dtype)  # (B,S,1,C)
    register_token = _expand_special_token(params["register_token"], B, S, dtype)

    # ---- GT camera branch -------------------------------------------------
    camera_mask = _frame_mask(aux.camera_mask, B, S)
    pose_encoding = None
    if camera_mask is not None:
        pose_encoding = compute_pose_encoding(aux, (H, W), camera_mask)  # (B,S,9)
        pe_tok = (
            pose_encoding.astype(dtype) @ params["pose_embeddings"]["w"][0].astype(dtype)
            + params["pose_embeddings"]["b"][0].astype(dtype)
        )
        gt_camera = jnp.where(camera_mask[:, :, None], pe_tok, 0.0)  # (B,S,C)
    else:
        gt_camera = jnp.zeros((B, S, C), dtype)

    # input-group adapter: bias reaches every frame (adapter(0) = bias)
    adapt0 = (
        gt_camera @ params["camera_adapters"]["w"][0].astype(dtype)
        + params["camera_adapters"]["b"][0].astype(dtype)
    )
    camera_token = camera_token + adapt0[:, :, None, :]

    # ---- GT depth branch --------------------------------------------------
    depth_mask = _frame_mask(aux.depth_mask, B, S)
    if depth_mask is not None:
        dn = masked_normalize_depth(aux.depth, aux.depth_valid, depth_mask)  # (B,S,H,W,1)
        dm = jnp.concatenate([dn, aux.depth_valid[..., None]], axis=-1)  # (B,S,H,W,2)
        d_tok = L.patch_embed(
            {"proj": params["depth_patch_embed"]["proj"]},
            dm.reshape(B * S, H, W, 2).astype(dtype),
            cfg.patch_size,
        ).reshape(B, S, n_patch, C)
        placeholder = params["depth_placeholder"].astype(dtype)  # (1,1,C)
        gt_depth = jnp.where(
            depth_mask[:, :, None, None], d_tok, placeholder[None]
        )
    else:
        gt_depth = jnp.broadcast_to(
            params["depth_placeholder"].astype(dtype)[None], (B, S, n_patch, C)
        )

    patch_tokens = patch_tokens.reshape(B, S, n_patch, C) + gt_depth
    tokens = jnp.concatenate([camera_token, register_token, patch_tokens], axis=2)

    # ---- RoPE tables ------------------------------------------------------
    head_dim = C // cfg.num_heads
    if cfg.rope_freq > 0:
        cos_f, sin_f = R.rope_tables(gh, gw, psi, head_dim, cfg.rope_freq)
        cos_f, sin_f = cos_f.astype(dtype), sin_f.astype(dtype)
        cos_g, sin_g = R.tile_tables(cos_f, sin_f, S)
    else:
        cos_f = sin_f = cos_g = sin_g = None

    # ---- the hot loop: scan over 24 (frame, global) layer pairs -----------
    n_out = len(output_layers)
    slot_of_layer = np.full((cfg.depth,), -1, np.int32)
    for i, l in enumerate(output_layers):
        slot_of_layer[l] = i
    slot_arr = jnp.asarray(slot_of_layer)

    # per-layer injection groups 1..depth (group index+1, omnivggt_aggregator.py:238)
    layer_params = {
        "frame": params["frame_blocks"],
        "global": params["global_blocks"],
        "pose_emb": jax.tree.map(lambda x: x[1:], params["pose_embeddings"]),
        "adapter": jax.tree.map(lambda x: x[1:], params["camera_adapters"]),
    }
    if camera_mask is not None:
        pe_f32 = pose_encoding.astype(dtype)
        cam_mask_f = camera_mask[:, :, None].astype(dtype)
    else:
        pe_f32 = jnp.zeros((B, S, cfg.pose_hidden_dim), dtype)
        cam_mask_f = jnp.zeros((B, S, 1), dtype)

    out_buf = jnp.zeros((n_out, B, S, P, 2 * C), dtype)

    if tuple(cfg.aa_order) not in (("frame", "global"), ("global", "frame")):
        raise NotImplementedError(f"aa_order {cfg.aa_order}")

    dp_rate = cfg.drop_path_rate if train_rng is not None else 0.0
    if dp_rate > 0.0:
        # 2 residual-dropping blocks per layer pair; keys threaded as scan xs
        # (shape-tuple split works for both legacy uint32 and typed PRNG keys)
        dp_keys = jax.random.split(train_rng, (cfg.depth, 2))
    else:
        dp_keys = None  # eval: no rng xs in the scan at all

    def frame_step(tokens, lp, dp_key):
        x = tokens.reshape(B * S, P, C)
        if sharding is not None:
            x = sharding.constrain_rows(x)
        x = L.block(
            lp["frame"], x, cos_f, sin_f,
            num_heads=cfg.num_heads, ln_eps=cfg.ln_eps, attn_impl=attn_impl,
            shard=frame_shard,
            drop_path_rate=dp_rate,
            drop_path_key=dp_key if dp_rate > 0.0 else None,
            allow_bounded=allow_bounded,
            approx_gelu=approx_gelu,
            int8_dense=int8_dense,
            int8_qk=int8_qk,
        )
        x = x.reshape(B, S, P, C)
        # camera re-injection into the camera token (slot 0)
        pe_tok = pe_f32 @ lp["pose_emb"]["w"].astype(dtype) + lp["pose_emb"]["b"].astype(dtype)
        cam_full = pe_tok * cam_mask_f
        inj = cam_full @ lp["adapter"]["w"].astype(dtype) + lp["adapter"]["b"].astype(dtype)
        return x.at[:, :, 0, :].add(inj)

    # padded frames (bucketed serving) must be invisible as global-attention
    # keys; token order is frame-major, so valid tokens form a prefix
    kv_valid_tokens = (
        None if num_valid_frames is None else num_valid_frames * P
    )

    def global_step(tokens, lp, dp_key):
        g = tokens.reshape(B, S * P, C)
        if sharding is not None:
            g = sharding.constrain_tokens_global(g)
        g = L.block(
            lp["global"], g, cos_g, sin_g,
            num_heads=cfg.num_heads, ln_eps=cfg.ln_eps, attn_impl=attn_impl,
            shard=global_shard,
            drop_path_rate=dp_rate,
            drop_path_key=dp_key if dp_rate > 0.0 else None,
            kv_valid=kv_valid_tokens,
            allow_bounded=allow_bounded,
            approx_gelu=approx_gelu,
            int8_dense=int8_dense,
            int8_qk=int8_qk,
        )
        return g.reshape(B, S, P, C)

    frame_first = tuple(cfg.aa_order)[0] == "frame"

    def step(carry, xs):
        tokens, out_buf = carry
        if dp_keys is not None:
            lp, layer_idx, dp_key = xs
        else:
            lp, layer_idx = xs
            dp_key = (None, None)

        if frame_first:
            frame_inter = frame_step(tokens, lp, dp_key[0])
            global_inter = global_step(frame_inter, lp, dp_key[1])
            tokens = global_inter
        else:
            global_inter = global_step(tokens, lp, dp_key[0])
            frame_inter = frame_step(global_inter, lp, dp_key[1])
            tokens = frame_inter

        # store this layer's (frame ‖ global) concat if a head consumes it
        # (the reference concatenates in this fixed order for either aa_order,
        # models/aggregator.py:272-275); lax.cond skips the concat + 45MB-class
        # buffer write entirely on the layers no head reads
        slot = slot_arr[layer_idx]

        def write_slot(buf):
            out = jnp.concatenate([frame_inter, global_inter], axis=-1)
            return jax.lax.dynamic_update_index_in_dim(
                buf, out, jnp.maximum(slot, 0), 0
            )

        out_buf = jax.lax.cond(slot >= 0, write_slot, lambda buf: buf, out_buf)
        return (tokens, out_buf), None

    if remat:
        # trade FLOPs for memory when training: recompute each layer pair in
        # the backward pass instead of storing its activations (the reference
        # uses torch checkpointing the same way, omnivggt_aggregator.py:292-298).
        # remat=True/"full" saves nothing; remat="dots" keeps matmul outputs
        # (no-batch-dim dots) — more memory, less recompute — for configs
        # with HBM headroom.
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if remat == "dots"
            else jax.checkpoint_policies.nothing_saveable
        )
        step = jax.checkpoint(step, policy=policy)
    xs = (layer_params, jnp.arange(cfg.depth))
    if dp_keys is not None:
        xs = xs + (dp_keys,)
    (tokens, out_buf), _ = jax.lax.scan(
        step, (tokens.astype(dtype), out_buf), xs
    )
    return out_buf, psi
