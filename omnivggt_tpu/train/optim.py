"""Optimizer construction details: weight-decay masking and layer-wise LR decay.

Working equivalent of the reference's dead get_parameter_groups layer-decay
(/root/reference/omnivggt/datasets/utils/misc.py:391-448): biases, norms,
LayerScale gammas and learned tokens are excluded from weight decay, and
transformer layers get lr * decay^(n_layers - layer) with the earliest layers
updated least.

TPU twist: our block parameters are STACKED along a leading layer dim (for the
lax.scan), so per-layer scales are broadcast arrays multiplying the update
slices — no parameter groups needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

_NO_DECAY_KEYS = (
    "bias", "b", "scale", "gamma", "cls_token", "pos_embed", "register_tokens",
    "camera_token", "register_token", "depth_placeholder", "empty_pose_tokens",
)
_STACKED_BLOCK_KEYS = ("blocks", "frame_blocks", "global_blocks", "trunk")


def weight_decay_mask(params):
    """True = apply weight decay (matrices only; no biases/norms/tokens)."""

    def mask(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if any(n in _NO_DECAY_KEYS for n in names):
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(mask, params)


class _LayerDecayState(NamedTuple):
    pass


def scale_by_layer_decay(params_template, layer_decay: float = 0.9):
    """GradientTransformation multiplying updates by decay^(n_layers - layer)
    for stacked per-layer block params (leading dim = layer) and by
    decay^n_layers for the patch-embed/backbone inputs below them.

    Must be chained AFTER the inner optimizer (e.g. adamw): Adam's
    m/sqrt(v) normalisation is invariant to a constant gradient scaling, so
    pre-scaling gradients would be a no-op — the per-layer scale has to
    multiply the final update."""

    # deepest stacked block count in this model (for the below-the-blocks scale)
    max_depth = 1
    for path, leaf in jax.tree_util.tree_leaves_with_path(params_template):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if any(k in names for k in _STACKED_BLOCK_KEYS):
            max_depth = max(max_depth, leaf.shape[0])

    def scales_for(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        for key in _STACKED_BLOCK_KEYS:
            if key in names:
                n = leaf.shape[0]
                s = layer_decay ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
                return s.reshape((n,) + (1,) * (leaf.ndim - 1))
        if "patch_embed" in names:
            return jnp.asarray(layer_decay**max_depth, jnp.float32)
        return jnp.asarray(1.0, jnp.float32)

    scale_tree = jax.tree_util.tree_map_with_path(scales_for, params_template)

    def init_fn(params):
        del params
        return _LayerDecayState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree.map(lambda u, s: u * s.astype(u.dtype), updates, scale_tree)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_finetune_optimizer(
    params_template,
    learning_rate: float = 1e-5,
    weight_decay: float = 0.05,
    layer_decay: float = 0.9,
    warmup_steps: int = 500,
    total_steps: int = 50_000,
    grad_clip: float = 1.0,
):
    """AdamW with warmup-cosine LR, masked weight decay and layer-wise decay —
    the fine-tuning recipe the reference's dead trainer sketched."""
    # short smoke runs (--steps 3) would give the cosine a negative decay
    # length with the default warmup; clamp so warmup always fits inside
    # the run with at least one decay step
    warmup_steps = min(warmup_steps, max(total_steps - 1, 0))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, total_steps, learning_rate * 0.05
    )
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            schedule,
            weight_decay=weight_decay,
            mask=weight_decay_mask(params_template),
        ),
        # after adamw: Adam normalisation cancels any pre-scaling
        scale_by_layer_decay(params_template, layer_decay),
    )
