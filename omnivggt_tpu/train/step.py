"""Sharded training step (the subsystem the reference only has as dead DDP
boilerplate, /root/reference/omnivggt/datasets/utils/misc.py:179-331).

TPU-native: one jit-compiled step over a global (data, seq) Mesh —
data-parallel over scenes, sequence-parallel over frames/tokens — with XLA
inserting the gradient reductions; optax for the optimiser; mixed precision
(bf16 trunk, fp32 heads/optimiser state) via the model's compute_dtype.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from omnivggt_tpu.config import OmniVGGTConfig
from omnivggt_tpu.models import omnivggt as M
from omnivggt_tpu.models.aggregator import AuxInputs
from omnivggt_tpu.train import losses as LS


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.05,
    warmup_steps: int = 1000,
    total_steps: int = 100_000,
    grad_clip: float = 1.0,
):
    """AdamW + half-cosine schedule with linear warmup + global-norm clipping
    (the standard recipe; the reference's dead trainer used the same shape,
    datasets/utils/misc.py:451-466)."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=learning_rate * 0.05,
    )
    from omnivggt_tpu.train.optim import weight_decay_mask

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        # callable mask: evaluated on the param tree at init, so biases,
        # norms, LayerScale gammas and learned tokens are not decayed
        optax.adamw(schedule, weight_decay=weight_decay, mask=weight_decay_mask),
    )


def init_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_train_step(
    cfg: OmniVGGTConfig,
    optimizer,
    sharding=None,
    *,
    use_aux_inputs: bool = False,
    remat=True,  # True/'full' = save nothing; 'dots' = keep matmul outputs
    seed: int = 0,
    state_sharding: str = "none",  # "none" | "zero2" | "fsdp"
):
    """Returns train_step(state, batch) -> (state, metrics).

    batch keys: images (B,S,H,W,3), extrinsics, intrinsics, depth,
    depth_valid, world_points; optionally camera_mask/depth_mask (S,) when
    use_aux_inputs (modality-injection training).

    Stochastic depth (cfg.aggregator.drop_path_rate > 0) draws a fresh rng
    per step by folding the step counter into `seed`.

    state_sharding (requires `sharding`): ZeRO-style distributed state via
    GSPMD annotations (parallel/fsdp.py). "zero2" reduce-scatters gradients
    and shards the AdamW moments over the whole mesh (params replicated);
    "fsdp" shards the params too (all-gathered per use). Numerically
    identical to "none" up to reduction order; required for the 1.2B
    flagship, whose replicated fp32 state (19.5 GB/chip) over-fills a v5e
    at any mesh size. Initialise the state with fsdp.sharded_init so it is
    *born* sharded.
    """
    if (cfg.trunk_quant != "none" or cfg.attn_quant != "none"
            or cfg.head_quant != "none"):
        # the W8A8 paths' round() has a zero gradient — serving modes only
        raise ValueError(
            "trunk_quant/attn_quant/head_quant are serving-only fast modes "
            "(round() kills the gradient); train with all set to 'none'"
        )
    if state_sharding != "none":
        from omnivggt_tpu.parallel import fsdp as FS

        if state_sharding not in FS.STATE_SHARDING_MODES:
            raise ValueError(
                f"state_sharding={state_sharding!r}; expected one of "
                f"{FS.STATE_SHARDING_MODES}"
            )
        if sharding is None:
            raise ValueError(
                "state_sharding needs a ModelSharding (its mesh is the "
                "axis set the state shards over)"
            )
    base_rng = jax.random.PRNGKey(seed)

    def loss_fn(params, batch, step):
        H, W = batch["images"].shape[2:4]
        aux = None
        if use_aux_inputs:
            aux = AuxInputs(
                extrinsics=batch["extrinsics"],
                intrinsics=batch["intrinsics"],
                depth=batch["depth"],
                depth_valid=batch["depth_valid"],
                camera_mask=batch["camera_mask"],
                depth_mask=batch["depth_mask"],
            )
        train_rng = (
            jax.random.fold_in(base_rng, step)
            if cfg.aggregator.drop_path_rate > 0.0
            else None
        )
        preds = M.apply(
            params, batch["images"], cfg, aux, sharding=sharding, remat=remat,
            train_rng=train_rng,
            # no DINO token padding when differentiating: kv_valid masking
            # costs a compare/select pass over every score tile in both
            # fused backward kernels; unpadded attention masks nothing
            pad_tokens=False,
        )
        losses = LS.total_loss(preds, batch, (H, W))
        return losses["total"], losses

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, state.step
        )
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        if state_sharding != "none":
            # the ZeRO scatter point: constraining the gradient tree here
            # turns the data-parallel all-reduce into reduce-scatter, and
            # everything downstream (moments, updates) stays sharded
            grads = FS.constrain_tree(grads, sharding.mesh)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        if state_sharding == "zero2":
            # params re-replicate (the update all-gathers); weights then
            # read with zero gather traffic in the next forward
            params = FS.replicate_tree(params, sharding.mesh)
        elif state_sharding == "fsdp":
            params = FS.constrain_tree(params, sharding.mesh)
        if state_sharding != "none":
            opt_state = FS.constrain_tree(opt_state, sharding.mesh)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
