"""ZeRO-style training-state sharding (GSPMD annotations, not manual comms).

The reference's training story is replicated-state DDP boilerplate
(/root/reference/omnivggt/datasets/utils/misc.py:179-331, dead code). On TPU
the idiomatic equivalent of DeepSpeed-ZeRO / FSDP is *sharding annotations*:
store each large parameter's gradient and AdamW moments (and, in "fsdp" mode,
the parameter itself) sharded over the whole mesh, and let GSPMD insert the
collectives — reduce-scatter where the backward meets the sharded gradient
buffer, all-gather where the forward consumes a sharded weight — riding ICI.
No hand-written ppermute/psum: the annotation IS the strategy.

Why this subsystem is load-bearing and not an option: the 1.2B flagship's
fp32 params (4.88 GB) + grads (4.88) + AdamW m/v (9.76) = 19.5 GB of
*state*, over a v5e's 15.75 GB HBM before a single activation — so
replicated-state training cannot run on any chip count (the per-chip
footprint never shrinks). Sharded 8 ways:

    mode      params   grads   m/v    state/chip   (flagship, fp32, 8 dev)
    none      4.88     4.88    9.76   19.5 GB      OOM at any view count
    zero2     4.88     0.61    1.22    6.7 GB      fits; full grads exist
                                                   only layer-by-layer in
                                                   the backward before the
                                                   scatter point
    fsdp      0.61     0.61    1.22    2.4 GB      fits with room for real
                                                   view counts; weights
                                                   all-gather per use

Sharding choice per leaf: the largest dimension divisible by the mesh size
(never a scan-stacked layer axis by construction — hidden/MLP dims dominate),
replicated if every dimension resists or the leaf is small enough that a
collective would cost more than the bytes save.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omnivggt_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS

# leaves below this element count stay replicated: a (1024,) bias sharded 8
# ways saves 3.5 KB/chip but costs an all-gather dispatch per use
_MIN_SHARD_ELEMS = 1 << 16

STATE_SHARDING_MODES = ("none", "zero2", "fsdp")


def _mesh_size(mesh: Mesh, axes) -> int:
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return n


def spec_for_leaf(shape, n_dev: int, axes, min_elems=None) -> P:
    """PartitionSpec sharding the largest n_dev-divisible dim of `shape`.

    Ties prefer the LAST such dim (trailing dims are the matmul-facing
    hidden/feature axes; leading dims are scan stacks / heads, whose
    sharding would put the collective inside the scan's slice)."""
    if min_elems is None:
        min_elems = _MIN_SHARD_ELEMS
    if math.prod(shape) < min_elems:
        return P()
    best = -1
    best_size = 0
    for i, s in enumerate(shape):
        if s % n_dev == 0 and s >= best_size:
            best, best_size = i, s
    if best < 0:
        return P()
    return P(*([None] * best), tuple(axes))


def tree_specs(tree, mesh: Mesh, axes=(DATA_AXIS, SEQ_AXIS),
               min_elems=None):
    """Per-leaf PartitionSpecs for any state pytree (params, grads, optax
    moments — anything whose leaves are arrays; scalars map to P()). Works
    on concrete arrays and ShapeDtypeStructs alike, so the same function
    pins the jit out_shardings at init and the in-step constraints, and the
    two can never disagree."""
    n_dev = _mesh_size(mesh, axes)
    return jax.tree.map(
        lambda x: spec_for_leaf(jnp.shape(x), n_dev, axes, min_elems), tree
    )


def constrain_tree(tree, mesh: Mesh, axes=(DATA_AXIS, SEQ_AXIS),
                   min_elems=None):
    """with_sharding_constraint every leaf to its tree_specs spec. On grads
    this is the ZeRO reduce-scatter point; on optimizer state it keeps the
    moments born sharded."""
    specs = tree_specs(tree, mesh, axes, min_elems)
    return jax.tree.map(
        lambda x, s: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, s)
        ),
        tree, specs,
    )


def replicate_tree(tree, mesh: Mesh):
    """Constrain every leaf replicated (zero2 keeps params this way: the
    forward then reads weights with zero gather traffic; only grads/moments
    pay collectives)."""
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P())
        ),
        tree,
    )


def state_shardings(state_shapes, mesh: Mesh, mode: str,
                    axes=(DATA_AXIS, SEQ_AXIS),
                    min_elems=None):
    """NamedSharding pytree for a TrainState (params, opt_state, step):
    the jit out_shardings that make the state *born* sharded — materialising
    a replicated flagship state first (19.5 GB) would OOM the very chips
    the sharding exists to fit."""
    if mode not in STATE_SHARDING_MODES:
        raise ValueError(
            f"state_sharding={mode!r}; expected one of {STATE_SHARDING_MODES}"
        )
    params_shapes, opt_shapes, step_shape = state_shapes

    def named(tree, shard: bool):
        if not shard:
            return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
        specs = tree_specs(tree, mesh, axes, min_elems)
        return jax.tree.map(
            lambda _, s: NamedSharding(mesh, s), tree, specs
        )

    return type(state_shapes)(
        named(params_shapes, shard=(mode == "fsdp")),
        named(opt_shapes, shard=(mode != "none")),
        NamedSharding(mesh, P()),
    )


def sharded_init(init_params_fn, optimizer, mesh: Mesh, mode: str,
                 axes=(DATA_AXIS, SEQ_AXIS),
                 min_elems=None):
    """Initialise a TrainState directly into its sharded layout.

    init_params_fn: () -> params (pure; e.g. partial(M.init, rng, cfg)).
    The whole init runs under one jit whose out_shardings are the
    state_shardings tree, so each chip only ever materialises its shard."""
    from omnivggt_tpu.train.step import init_state

    def build():
        return init_state(init_params_fn(), optimizer)

    shapes = jax.eval_shape(build)
    out = state_shardings(shapes, mesh, mode, axes, min_elems)
    return jax.jit(build, out_shardings=out)()


def state_bytes_per_device(state_shapes, mesh: Mesh, mode: str,
                           axes=(DATA_AXIS, SEQ_AXIS),
                           min_elems=None) -> int:
    """Steady-state training-state bytes per chip under `mode` (params +
    optimizer state; excludes activations and the transient backward).
    Takes eval_shape output — nothing is materialised."""
    n_dev = _mesh_size(mesh, axes)
    params_shapes, opt_shapes, _ = state_shapes

    def tree_bytes(tree, shard: bool) -> int:
        total = 0
        for leaf in jax.tree.leaves(tree):
            nbytes = math.prod(jnp.shape(leaf)) * jnp.dtype(leaf.dtype).itemsize
            if shard and spec_for_leaf(
                jnp.shape(leaf), n_dev, axes, min_elems
            ) != P():
                nbytes //= n_dev
            total += nbytes
        return total

    return tree_bytes(params_shapes, mode == "fsdp") + tree_bytes(
        opt_shapes, mode != "none"
    )
