"""Fused flash attention (non-causal) as a Pallas TPU kernel.

TPU equivalent of the torch SDPA flash path the reference relies on
(/root/reference/omnivggt/layers/attention.py:60-66). Streaming softmax over
key blocks keeps memory O(block_q * block_k) in VMEM; the (q @ k^T) and
(p @ v) matmuls ride the MXU with fp32 accumulation.

Layout: (B, N, H, D) in HBM; the forward runs on (B*H, N, D) with grid
(BH, q_blocks, k_blocks), k innermost so the scratch accumulator carries the
running (max, denom, acc) across key blocks for one q tile. The forward also
emits the log-sum-exp rows when training.

The backward pass is fused too (the reference trains through cuDNN's fused
flash backward): two Pallas kernels recompute probabilities from the saved
LSE — one accumulates dq over key blocks, the other accumulates dk/dv over
query blocks. The LSE is stored sublane-oriented ((BH, N, 8), column 0) so
the per-row broadcasts need no sublane<->lane relayout, and
delta = rowsum(dO * O) is recomputed in-tile from the dO/O tiles.

The kv_valid (valid-prefix masked) variant shares the same fused backward:
the recompute kernels mask keys >= kv_valid against an SMEM scalar exactly
like the forward (p = 0 zeroes both the masked keys' dq contributions and
their own dk/dv rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 768  # 896 puts the fp32 score tile ~0.4 MB over the 16 MB
DEFAULT_BLOCK_K = 2048  # scoped-VMEM limit once the surrounding model is live
# the int8-qk kernel's q/k tiles are quarter-size, which buys room for wider
# key blocks: (768, 3072) measured 4.83 ms/layer vs 5.20 at (768, 2048) on
# the global-attention shape ((768, 4096) fails to compile standalone)
DEFAULT_INT8_BLOCK_K = 3072
# the backward kernels keep two (block_q, block_k) fp32 score tiles (p and ds)
# live at once, so they run at smaller blocks than the forward. (512, 2048)
# measured fastest standalone (33.4 ms fwd+bwd) but its ~10 MB scoped VMEM
# OOMs inside a full train graph; 1536 (33.6 ms standalone) keeps the
# forward-sized ~6 MB tile budget that is known to fit in-model
DEFAULT_BWD_BLOCK_Q = 512
DEFAULT_BWD_BLOCK_K = 1536
_LANES = 128
# Finite "minus infinity": true -inf scores make the VPU hit special-value
# slow paths (measured ~40x slowdown on v5e); -1e30 underflows exp to 0 at
# full speed and is far below any real logit.
_NEG_INF = -1e30
# bounded mode's insurance clamp: exp(80) = 5.5e34 stays finite in fp32 AND
# bf16 (both have 8-bit exponents); real qk-normed scores are bounded well
# below this, so the clamp never binds on sane weights
_BOUNDED_CLAMP = 80.0


def _flash_kernel(
    *refs, scale, n_keys, block_k, dynamic_valid, fold_sum, head_dim,
    bounded, return_lse=False, qk_int8=False
):
    if qk_int8:
        # per-head combined dequant scale (q_scale * k_scale * softmax
        # scale), whole (BH, 1) array in SMEM, indexed by the head program
        c_ref, *refs = refs
    if dynamic_valid:
        # kv_valid: (1, 1) int32 in SMEM — number of valid (unmasked) keys
        nv_ref, q_ref, k_ref, v_ref, *refs = refs
    else:
        q_ref, k_ref, v_ref, *refs = refs
        nv_ref = None
    if return_lse:
        o_ref, lse_ref, *scr = refs
    else:
        o_ref, *scr = refs
        lse_ref = None
    # bounded mode (caller guarantees |scores| << 88, e.g. qk-normed inputs):
    # softmax runs at a fixed max of 0 — no running-max scratch, no max
    # reduction pass over the score tile, no accumulator rescales
    m_scr = None if bounded else scr[0]
    l_scr, acc_scr = scr[-2], scr[-1]
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        if m_scr is not None:
            m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    if qk_int8:
        # W8A8 scores: the int8 MXU runs at 2x the bf16 rate, and at D=64
        # the bf16 qk matmul only half-fills the MXU contraction depth —
        # measured 4.93 ms/layer vs 6.55 at the (1, 10992, 16, 64) global-
        # attention shape. The per-head scalar dequant (softmax scale folded
        # in) fuses into the exp chain that passes over the score tile
        # anyway, so dequant costs no extra (bq, bk) pass.
        s = jax.lax.dot_general(
            q_ref[0],
            k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * c_ref[pl.program_id(0), 0]  # (bq, bk)
    else:
        # fold the softmax scale into the (bq, D) q tile — a D-wide pass
        # instead of a bk-wide pass over the score tile (VPU-bound kernel;
        # every pass over (bq, bk) data costs ~2 ms across the grid)
        q = q_ref[0].astype(jnp.float32) * scale  # (bq, D)
        k = k_ref[0]  # (bk, D)
        s = jax.lax.dot_general(
            q.astype(k.dtype),
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)

    def body(s):
        """One streaming-softmax update from the (bq, bk) score tile s."""
        if bounded:
            # the min() clamp fuses into the exp pass (one elementwise chain
            # over the tile) and is pure insurance: the caller's bound keeps
            # real scores far below it (see flash_attention docstring)
            p = jnp.exp(jnp.minimum(s, _BOUNDED_CLAMP))
            if fold_sum:
                both = jax.lax.dot_general(
                    p.astype(v_ref.dtype),
                    v_ref[0],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                l_scr[:, :1] += both[:, head_dim:head_dim + 1]
                acc_scr[:] += both[:, :head_dim]
            else:
                l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
                acc_scr[:] += jax.lax.dot_general(
                    p.astype(v_ref.dtype),
                    v_ref[0],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return
        m_prev = m_scr[:, :1]  # (bq, 1)
        l_prev = l_scr[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp(s - m_next)
        corr = jnp.exp(m_prev - m_next)
        if fold_sum:
            # v carries a ones-column at lane `head_dim` (caller packs it to
            # the 128-lane tile D=64 would waste on the MXU anyway), so one
            # matmul yields both the weighted values and the row sums —
            # saving the cross-lane VPU reduction pass over the score tile
            both = jax.lax.dot_general(
                p.astype(v_ref.dtype),
                v_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, 128): [:head_dim] = p @ v, [head_dim] = rowsum(p)
            l_next = l_prev * corr + both[:, head_dim:head_dim + 1]
            acc_scr[:] = acc_scr[:] * corr + both[:, :head_dim]
        else:
            l_next = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
                p.astype(v_ref.dtype),
                v_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)

    # mask invalid keys. Static case: only the FINAL block can contain
    # (zero-)padding, and only when n_keys is not a multiple of block_k —
    # branching on the block index keeps the iota/compare/select pass off
    # every other block. Dynamic case (kv_valid given): the valid-key count
    # is a runtime scalar, so every block masks against it.
    if dynamic_valid:
        key_idx = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        body(jnp.where(key_idx < nv_ref[0, 0], s, _NEG_INF))
    elif n_keys % block_k != 0:
        @pl.when(ki == nk - 1)
        def _():
            key_idx = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1
            )
            body(jnp.where(key_idx < n_keys, s, _NEG_INF))

        @pl.when(ki != nk - 1)
        def _():
            body(s)
    else:
        body(s)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)
        if return_lse:
            # sublane-oriented per-row stats; stored (bq, 8) — the minimal
            # legal trailing tile — so the backward reads them back with no
            # sublane<->lane relayout. In bounded mode the running max is
            # identically 0, so lse = log(l) — same contract downstream.
            lse = jnp.log(l_scr[:, :1])
            if m_scr is not None:
                lse = m_scr[:, :1] + lse
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def to_bhnd(x):
    """(B, N, H, D) -> (B*H, N, D): the head-major layout every Pallas
    attention kernel here runs on (contiguous per-head rows)."""
    B, N, H, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B * H, N, D)


def _quant_per_head(x, valid=None, amax_reduce=None):
    """(BH, N, D) float -> (int8 values, (BH, 1) fp32 scales): symmetric
    max-abs quantisation per head slab. |x|/scale <= 127 exactly, so no
    clip is needed after round.

    valid: optional traced row count — rows >= valid are EXCLUDED from the
    max-abs reduce (and clipped after round, since they may exceed the
    scale). Bucketed serving pads frames with garbage activations; without
    this, the padding would perturb the per-head scales and break the
    padded-forward == unpadded-forward contract for the real frames.

    amax_reduce: optional callable applied to the per-head (BH,) max-abs
    before the scale is formed — the ring kernels pass a lax.pmax over the
    ring axis so every rotating shard shares one int8 grid (a cross-device
    max only grows the scale, so no clip is needed either)."""
    xf = x.astype(jnp.float32)
    xa = jnp.abs(xf)
    if valid is not None:
        row = jnp.arange(x.shape[1])[None, :, None]
        xa = jnp.where(row < valid, xa, 0.0)
    amax = jnp.max(xa, axis=(1, 2))  # (BH,)
    if amax_reduce is not None:
        amax = amax_reduce(amax)
    scale = (jnp.maximum(amax, 1e-30) / 127.0)[:, None, None]
    x8 = jnp.round(xf / scale)
    if valid is not None:
        x8 = jnp.clip(x8, -127, 127)
    return x8.astype(jnp.int8), scale[:, :, 0]


def _flash_forward(
    q, k, v, block_q, block_k, kv_valid=None, return_lse=False,
    bounded=False, qk_int8=False, k_quant=None,
):
    B, N, H, D = q.shape
    scale = D**-0.5
    if qk_int8 and return_lse:
        raise ValueError("qk_int8 is a serving-only forward mode (no LSE)")

    if k_quant is not None:
        # pre-quantised K: (k8 (BH, Nk, D) int8, k_scale (BH, 1) fp32) from
        # the caller — the sharded allgather strategy quantises LOCAL K
        # shards with pmax-global scales and gathers int8 (half the ICI
        # bytes, 1/n_dev the quant work; bit-identical grid to quantising
        # the gathered array). kv_valid scale masking happens upstream.
        if not qk_int8 or kv_valid is not None:
            raise ValueError("k_quant requires qk_int8 and no kv_valid")
        kf, k_scale = k_quant
        Nk = kf.shape[1]
        qf, vf = to_bhnd(q), to_bhnd(v)
    else:
        Nk = k.shape[1]
        qf, kf, vf = to_bhnd(q), to_bhnd(k), to_bhnd(v)

    block_q = _pick_block(N, block_q, 8)
    block_k = _pick_block(Nk, block_k, 128)
    pad_q = (-N) % block_q
    pad_k = (-Nk) % block_k
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))

    # fold the softmax row sum into the p @ v matmul: pad v to the 128-lane
    # MXU tile (free for D=64 — the matmul occupies the full lane tile either
    # way) with a ones-column at lane D. Padded/masked keys have p == 0 and
    # contribute nothing to the folded sum. Only worth it while the packing
    # stays within one lane tile. Built as ONE concatenate so XLA emits a
    # single fused write (pad + .at[].set costs an extra full pass over v).
    fold_sum = D < _LANES
    Dv = D
    if fold_sum:
        Dv = _LANES
        tail = jnp.zeros((Dv - D,), vf.dtype).at[0].set(1.0)
        vf = jnp.concatenate(
            [vf, jnp.broadcast_to(tail, (*vf.shape[:2], Dv - D))], axis=-1
        )

    if qk_int8:
        # block-padding rows are zero and quantise to zero (pad-invariant
        # scales); kv_valid (bucketed serving) additionally excludes the
        # padded frames' garbage rows from BOTH q and k scales — the same
        # valid prefix applies to queries in this self-attention, and the
        # caller discards the padded query outputs
        qf, q_scale = _quant_per_head(qf, valid=kv_valid)
        if k_quant is None:
            kf, k_scale = _quant_per_head(kf, valid=kv_valid)
        else:
            k_scale = k_quant[1]
        c = (q_scale * k_scale * scale).astype(jnp.float32)  # (BH, 1)

    grid = (B * H, qf.shape[1] // block_q, kf.shape[1] // block_k)
    dynamic_valid = kv_valid is not None

    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
        pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
        pl.BlockSpec((1, block_k, Dv), lambda b, qi, ki: (b, ki, 0)),
    ]
    inputs = [qf, kf, vf]
    if dynamic_valid:
        in_specs.insert(
            0,
            pl.BlockSpec(
                (1, 1), lambda b, qi, ki: (0, 0), memory_space=pltpu.SMEM
            ),
        )
        inputs.insert(0, jnp.asarray(kv_valid, jnp.int32).reshape(1, 1))
    if qk_int8:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.insert(0, c)

    out_specs = pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0))
    out_shape = jax.ShapeDtypeStruct(qf.shape, q.dtype)
    if return_lse:
        out_specs = (
            out_specs,
            pl.BlockSpec((1, block_q, 8), lambda b, qi, ki: (b, qi, 0)),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((B * H, qf.shape[1], 8), jnp.float32),
        )

    scratch_shapes = [
        pltpu.VMEM((block_q, _LANES), jnp.float32),  # l (and m when not bounded)
        pltpu.VMEM((block_q, D), jnp.float32),  # acc
    ]
    if not bounded:
        scratch_shapes.insert(0, pltpu.VMEM((block_q, _LANES), jnp.float32))

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, n_keys=Nk, block_k=block_k,
            dynamic_valid=dynamic_valid, fold_sum=fold_sum, head_dim=D,
            bounded=bounded, return_lse=return_lse, qk_int8=qk_int8,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)

    if return_lse:
        out, lse = out
        if pad_q:
            out, lse = out[:, :N], lse[:, :N]
        return out.reshape(B, H, N, D).transpose(0, 2, 1, 3), lse[..., 0]
    if pad_q:
        out = out[:, :N]
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)


def _round_up(x, m):
    return -(-x // m) * m


def _pick_block(n: int, default: int, align: int) -> int:
    """Block size near `default` that minimises padding of an n-row axis.

    Naive min(default, n)-style blocking wastes up to ~50% compute on ragged
    lengths (e.g. the 1374-token frame-attention axis padded to 2048 by
    block 1024). Trying ceil(n/default) and floor(n/default) block counts and
    keeping the least-padded choice caps the waste at the alignment rounding
    (1392/1376 for 1374), while never growing a block past 2x default (VMEM).
    """
    if n <= align:
        return align
    candidates = {max(1, -(-n // default)), max(1, n // default)}
    best = None
    for nb in candidates:
        block = _round_up(-(-n // nb), align)
        if block > 2 * default:
            continue
        padded = block * nb
        if best is None or (padded, block) < best:
            best = (padded, block)
    if best is None:
        return min(default, _round_up(n, align))
    return best[1]


# ---------------------------------------------------------------------------
# fused backward
# ---------------------------------------------------------------------------


def _bwd_recompute(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, *, scale, n_keys,
    block_k, key_block_idx, bounded=False, valid_ref=None
):
    """Shared backward recompute: returns (p, ds), both (block_q, block_k)
    fp32, where p = softmax(scale * q k^T) rebuilt from the saved LSE and
    ds = p * (dP - delta) with dP = dO v^T, delta = rowsum(dO * O). LSE is
    stored sublane-oriented ((bq, 8) tiles, column 0), so the per-row
    broadcasts need no relayout.

    bounded: mirror the forward's saturation clamp so p matches the forward
    exactly; without it, weights drifting past the logit bound would keep
    the forward finite (clamped) while exp(s - lse) overflows here and turns
    the gradients NaN. The clamp region gets straight-through gradients."""
    q = (q_ref[0].astype(jnp.float32) * scale).astype(k_ref.dtype)
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    if bounded:
        s = jnp.minimum(s, _BOUNDED_CLAMP)
    if valid_ref is not None:
        # dynamic kv_valid (valid-prefix masking): every block masks against
        # the runtime scalar, mirroring the forward — masked keys get p = 0,
        # which zeroes their dq contribution AND their own dk/dv rows
        # (dv = p^T dO, dk = ds^T q with ds = p * (...))
        key_idx = key_block_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(key_idx < valid_ref[0, 0], s, _NEG_INF)
    elif n_keys % block_k != 0:
        # zero-padded keys must contribute p=0 to dq (their own dk/dv rows
        # are sliced off by the caller)
        key_idx = key_block_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(key_idx < n_keys, s, _NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])
    do = do_ref[0]
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    delta = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # (bq, 1) — cheap to recompute per tile vs plumbing another input
    ds = p * (dp - delta)
    return p, ds


def _flash_bwd_dq_kernel(
    *refs, scale, n_keys, block_k, bounded, dynamic_valid=False
):
    """Grid (BH, q_blocks, k_blocks), k innermost: dq[qi] = scale * sum_ki
    ds @ k."""
    if dynamic_valid:
        nv_ref, *refs = refs
    else:
        nv_ref = None
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref, acc_scr = refs
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    _, ds = _bwd_recompute(
        q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
        scale=scale, n_keys=n_keys, block_k=block_k, key_block_idx=ki,
        bounded=bounded, valid_ref=nv_ref,
    )
    acc_scr[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, D)

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = (acc_scr[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    *refs, scale, n_keys, block_k, bounded, dynamic_valid=False
):
    """Grid (BH, k_blocks, q_blocks), q innermost: dv[ki] = sum_qi p^T @ dO,
    dk[ki] = scale * sum_qi ds^T @ q (MXU contracts the sublane dim natively).
    Zero-padded query rows contribute nothing: their dO and O rows are zero,
    so ds = p * (0 - 0) = 0 and p^T @ 0 = 0."""
    if dynamic_valid:
        nv_ref, *refs = refs
    else:
        nv_ref = None
    (q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dk_ref, dv_ref,
     dk_scr, dv_scr) = refs
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    p, ds = _bwd_recompute(
        q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
        scale=scale, n_keys=n_keys, block_k=block_k,
        key_block_idx=pl.program_id(1),
        bounded=bounded, valid_ref=nv_ref,
    )
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bk, D)
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bk, D)

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = (dk_scr[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, o, do, lse, block_q, block_k, bounded=False, kv_valid=None
):
    """Fused flash-attention backward: (dq, dk, dv) in the input layout.

    kv_valid: optional traced int32 scalar — mirrors the forward's
    valid-prefix masking; masked keys get p = 0 in the recompute, zeroing
    both their dq contribution and their own dk/dv rows."""
    B, N, H, D = q.shape
    Nk = k.shape[1]
    scale = D**-0.5

    qf, kf, vf = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    dof, of = to_bhnd(do), to_bhnd(o)

    # two (block_q, block_k) fp32 score tiles (p, ds) are live per step here,
    # so cap the backward blocks below the forward's VMEM-sized defaults
    block_q = _pick_block(N, min(block_q, DEFAULT_BWD_BLOCK_Q), 8)
    block_k = _pick_block(Nk, min(block_k, DEFAULT_BWD_BLOCK_K), 128)
    pad_q = (-N) % block_q
    pad_k = (-Nk) % block_k
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
        dof = jnp.pad(dof, ((0, 0), (0, pad_q), (0, 0)))
        of = jnp.pad(of, ((0, 0), (0, pad_q), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, pad_q)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))
    # sublane-oriented (BH, Nq, 8) layout (column 0 read in-kernel)
    lse8 = jnp.broadcast_to(lse[..., None], (*lse.shape, 8))

    BH = B * H
    nq = qf.shape[1] // block_q
    nk = kf.shape[1] // block_k

    q_spec = pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0))
    k_spec_q = pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0))
    row_spec = pl.BlockSpec((1, block_q, 8), lambda b, i, j: (b, i, 0))

    dynamic_valid = kv_valid is not None
    nv_inputs, nv_specs = [], []
    if dynamic_valid:
        nv_inputs = [jnp.asarray(kv_valid, jnp.int32).reshape(1, 1)]
        nv_specs = [
            pl.BlockSpec(
                (1, 1), lambda b, i, j: (0, 0), memory_space=pltpu.SMEM
            )
        ]

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, n_keys=Nk, block_k=block_k,
            bounded=bounded, dynamic_valid=dynamic_valid,
        ),
        grid=(BH, nq, nk),
        in_specs=nv_specs + [q_spec, k_spec_q, k_spec_q, q_spec, q_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*nv_inputs, qf, kf, vf, dof, of, lse8)

    # dkv grid: (BH, k_blocks, q_blocks) — q innermost
    q_spec_k = pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, j, 0))
    k_spec_k = pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, i, 0))
    row_spec_k = pl.BlockSpec((1, block_q, 8), lambda b, i, j: (b, j, 0))

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, n_keys=Nk, block_k=block_k,
            bounded=bounded, dynamic_valid=dynamic_valid,
        ),
        grid=(BH, nk, nq),
        in_specs=nv_specs + [
            q_spec_k, k_spec_k, k_spec_k, q_spec_k, q_spec_k, row_spec_k
        ],
        out_specs=(k_spec_k, k_spec_k),
        out_shape=(
            jax.ShapeDtypeStruct(kf.shape, k.dtype),
            jax.ShapeDtypeStruct(vf.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*nv_inputs, qf, kf, vf, dof, of, lse8)

    def from_bhnd(x, n):
        return x[:, :n].reshape(B, H, n, D).transpose(0, 2, 1, 3)

    return from_bhnd(dq, N), from_bhnd(dk, Nk), from_bhnd(dv, Nk)


def flash_attention(
    q, k, v, block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K, kv_valid=None,
    bounded_logits=False, qk_int8=False, k_quant=None,
):
    """Non-causal flash attention over (B, N, H, D) tensors; differentiable
    (except qk_int8 mode, which is serving-only).

    kv_valid: optional traced int32 scalar — keys >= kv_valid are masked
    (valid-prefix masking for bucketed serving).

    bounded_logits: set True ONLY when the caller can guarantee the scaled
    scores stay far below ~80 — e.g. q and k per-head-dim LayerNormed
    (qk-norm), where |q.k|/sqrt(D) <= sqrt(D) * (max|g_q|+max|b_q|) *
    (max|g_k|+max|b_k|) ~ 8 for D=64 and unit-scale norm weights. The
    softmax then runs at a fixed max of 0, skipping the running-max
    reduction pass over every score tile (~14% kernel time at the global-
    attention shape). An in-kernel clamp at 80 (fused into the exp pass)
    makes pathological weights saturate instead of overflowing.

    qk_int8: quantise q and k to int8 per head (symmetric max-abs) and run
    the score matmul on the 2x-rate int8 MXU, dequantising with a per-head
    scalar fused into the exp pass — measured -25% kernel time at the
    global-attention shape with ~1e-4 output deltas on qk-normed inputs.
    Serving-only (no VJP: round() kills the gradient); certified
    per-checkpoint via models/omnivggt.certify_fast_modes (attn_quant)."""
    if qk_int8:
        if block_k == DEFAULT_BLOCK_K:
            block_k = DEFAULT_INT8_BLOCK_K
        return _flash_forward(
            q, k, v, block_q, block_k, kv_valid=kv_valid,
            bounded=bounded_logits, qk_int8=True, k_quant=k_quant,
        )
    if k_quant is not None:
        raise ValueError("k_quant requires qk_int8")
    if kv_valid is None:
        return _flash_unmasked(q, k, v, block_q, block_k, bounded_logits)
    return _flash_masked(
        q, k, v, jnp.asarray(kv_valid, jnp.int32), block_q, block_k,
        bounded_logits,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_unmasked(q, k, v, block_q, block_k, bounded):
    return _flash_forward(q, k, v, block_q, block_k, bounded=bounded)


def _fwd(q, k, v, block_q, block_k, bounded):
    out, lse = _flash_forward(
        q, k, v, block_q, block_k, return_lse=True, bounded=bounded
    )
    return out, (q, k, v, out, lse)


def _bwd(block_q, block_k, bounded, res, g):
    # the backward rebuilds p = exp(s - lse) from the saved LSE, which is
    # max-convention-agnostic — bounded forward needs no backward changes
    q, k, v, o, lse = res
    return _flash_backward(q, k, v, o, g, lse, block_q, block_k, bounded)


_flash_unmasked.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_masked(q, k, v, kv_valid, block_q, block_k, bounded):
    return _flash_forward(
        q, k, v, block_q, block_k, kv_valid=kv_valid, bounded=bounded
    )


def _masked_fwd(q, k, v, kv_valid, block_q, block_k, bounded):
    out, lse = _flash_forward(
        q, k, v, block_q, block_k, kv_valid=kv_valid, return_lse=True,
        bounded=bounded,
    )
    return out, (q, k, v, kv_valid, out, lse)


def _masked_bwd(block_q, block_k, bounded, res, g):
    # fused Pallas backward, same two kernels as the unmasked path — the
    # recompute masks keys >= kv_valid exactly like the forward, so p = 0
    # zeroes masked-key contributions to dq and the masked dk/dv rows
    import numpy as _np

    q, k, v, kv_valid, o, lse = res
    dq, dk, dv = _flash_backward(
        q, k, v, o, g, lse, block_q, block_k, bounded, kv_valid=kv_valid
    )
    return dq, dk, dv, _np.zeros((), jax.dtypes.float0)


_flash_masked.defvjp(_masked_fwd, _masked_bwd)


# ---------------------------------------------------------------------------
# packed-heads (token-major) forward: frame / DINOv2 attention shapes
# ---------------------------------------------------------------------------
#
# The standard kernels above run head-major ((B*H, N, D)), which costs four
# HBM relayout passes per attention — q/k/v (B, N, H, D) -> (BH, N, D) plus
# the output back — because Pallas TPU cannot express a (1, bq, 1, D) block
# (singleton second-to-last dim). Measured at S=8 those transposes total
# ~18 ms/forward across the frame + DINOv2 attention families (48 layers of
# (8, ~1374, 16, 64)).
#
# This variant instead reads q/k/v in their NATURAL token-major layout
# ((B, N, H*D) — exactly the qkv matmul's output, so the relayouts vanish)
# and unrolls heads inside the kernel with STATIC 64-lane slices: for each
# head, a (bq, D) x (Nk, D) score matmul, a one-shot softmax (the whole key
# axis fits one block at these sequence lengths — no streaming state), and
# a p @ [v_h | ones] matmul that folds the row sum exactly like the
# streaming kernel. Per-head outputs concatenate back to (bq, H*D) lanes
# for a single natural-layout store.
#
# Forward-only by construction: under AD the custom_vjp wrappers below
# route the forward through the head-major kernel (whose fused backward
# needs head-major residuals anyway), so training numerics are unchanged.

DEFAULT_PACKED_BLOCK_Q = 232  # (344, 1374-whole-K) ran 548K over the 16 MB
# scoped-VMEM limit at the frame-attention shape; 232 (1374 -> 6 blocks,
# 18 pad rows) keeps the fp32 score tile + whole k/v blocks comfortably under
# the limit. The masked / running-max variants keep ~3 more live (bq, Nk)
# fp32 tiles on the Mosaic stack (mask select, running max, exp rescale):
# 232 measured 2.51M over the limit at the DINOv2 shape, so they run
# narrower q blocks.
DEFAULT_PACKED_BLOCK_Q_MASKED = 144
_PACKED_MAX_KEYS = 2048  # whole-K block budget: (2048, 1024) bf16 k + v


def _flash_packed_kernel(
    *refs, scale, num_heads, head_dim, n_keys, dynamic_valid, static_valid,
    bounded
):
    if dynamic_valid:
        nv_ref, q_ref, k_ref, v_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        nv_ref = None
    # fold the softmax scale into q across all heads at once (one C-wide
    # pass instead of a per-head Nk-wide pass over the score tiles)
    q = (q_ref[0].astype(jnp.float32) * scale).astype(k_ref.dtype)  # (bq, C)
    k = k_ref[0]  # (Nk, C)
    v = v_ref[0]
    fold = head_dim < _LANES
    if fold:
        # shared ones-column tail packed after each head's D value lanes:
        # one matmul then yields p @ v AND rowsum(p) (masked keys have
        # p == 0, so the ones rows contribute nothing for them)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (n_keys, _LANES - head_dim), 1
        )
        tail = (lane == 0).astype(v.dtype)
    need_mask = dynamic_valid or (
        static_valid is not None and static_valid < n_keys
    )
    if need_mask:
        nv = nv_ref[0, 0] if dynamic_valid else static_valid
        key_row = jax.lax.broadcasted_iota(jnp.int32, (1, n_keys), 1)
        invalid = key_row >= nv  # (1, Nk), broadcast over query rows
    outs = []
    for h in range(num_heads):
        lo = h * head_dim
        s = jax.lax.dot_general(
            q[:, lo:lo + head_dim],
            k[:, lo:lo + head_dim],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, Nk)
        if need_mask:
            s = jnp.where(invalid, _NEG_INF, s)
        if bounded:
            p = jnp.exp(jnp.minimum(s, _BOUNDED_CLAMP))
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        vh = v[:, lo:lo + head_dim]
        if fold:
            both = jax.lax.dot_general(
                p.astype(v.dtype),
                jnp.concatenate([vh, tail], axis=-1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, 128): [:D] = p @ v, [D] = rowsum(p)
            acc = both[:, :head_dim]
            l = both[:, head_dim:head_dim + 1]
        else:
            acc = jax.lax.dot_general(
                p.astype(v.dtype), vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l = jnp.sum(p, axis=-1, keepdims=True)
        outs.append(acc / l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _flash_packed_forward(q, k, v, block_q, kv_valid=None, bounded=False):
    B, N, H, D = q.shape
    C = H * D
    Nk = k.shape[1]
    if block_q is None:
        block_q = (
            DEFAULT_PACKED_BLOCK_Q
            if bounded and kv_valid is None
            else DEFAULT_PACKED_BLOCK_Q_MASKED
        )
    # (B, N, H, D) is a contiguous view of the token-major (B, N, C)
    # activations — these reshapes move no data
    q3, k3, v3 = (x.reshape(x.shape[0], x.shape[1], C) for x in (q, k, v))

    block_q = _pick_block(N, block_q, 8)
    pad_q = (-N) % block_q
    if pad_q:
        q3 = jnp.pad(q3, ((0, 0), (0, pad_q), (0, 0)))

    # the public wrapper splits the cases: kv_valid here is None, a Python
    # int (compile-time mask), or a traced scalar (SMEM input)
    static_valid = kv_valid if isinstance(kv_valid, (int, np.integer)) else None
    dynamic_valid = kv_valid is not None and static_valid is None
    inputs, nv_specs = [q3, k3, v3], []
    if dynamic_valid:
        inputs.insert(0, jnp.asarray(kv_valid, jnp.int32).reshape(1, 1))
        nv_specs = [
            pl.BlockSpec(
                (1, 1), lambda b, qi: (0, 0), memory_space=pltpu.SMEM
            )
        ]

    grid = (B, q3.shape[1] // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_packed_kernel, scale=D**-0.5, num_heads=H, head_dim=D,
            n_keys=Nk, dynamic_valid=dynamic_valid,
            static_valid=static_valid, bounded=bounded,
        ),
        grid=grid,
        in_specs=nv_specs + [
            pl.BlockSpec((1, block_q, C), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, Nk, C), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, Nk, C), lambda b, qi: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, C), lambda b, qi: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(*inputs)

    if pad_q:
        out = out[:, :N]
    return out.reshape(B, N, H, D)


def flash_attention_packed(
    q, k, v, block_q=None, kv_valid=None, bounded_logits=False,
):
    """Token-major packed-heads flash attention for short-sequence shapes
    (frame / DINOv2 attention, Nk <= _PACKED_MAX_KEYS): reads q/k/v in
    their natural (B, N, H*D) layout, eliminating the four head-major
    relayout passes per attention. Differentiable — AD routes the forward
    through the head-major kernel (see module comment)."""
    if k.shape[1] > _PACKED_MAX_KEYS:
        raise ValueError(
            f"packed kernel requires Nk <= {_PACKED_MAX_KEYS}, "
            f"got {k.shape[1]}"
        )
    if kv_valid is None:
        return _packed_unmasked(q, k, v, block_q, bounded_logits)
    if isinstance(kv_valid, (int, np.integer)):
        # static valid-prefix count compiles into the kernel's mask
        return _packed_static_masked(
            q, k, v, block_q, int(kv_valid), bounded_logits
        )
    return _packed_masked(
        q, k, v, jnp.asarray(kv_valid, jnp.int32), block_q, bounded_logits
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _packed_unmasked(q, k, v, block_q, bounded):
    return _flash_packed_forward(q, k, v, block_q, bounded=bounded)


def _packed_fwd(q, k, v, block_q, bounded):
    out, lse = _flash_forward(
        q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, return_lse=True,
        bounded=bounded,
    )
    return out, (q, k, v, out, lse)


def _packed_bwd(block_q, bounded, res, g):
    q, k, v, o, lse = res
    return _flash_backward(
        q, k, v, o, g, lse, DEFAULT_BWD_BLOCK_Q, DEFAULT_BWD_BLOCK_K, bounded
    )


_packed_unmasked.defvjp(_packed_fwd, _packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _packed_static_masked(q, k, v, block_q, kv_valid, bounded):
    return _flash_packed_forward(
        q, k, v, block_q, kv_valid=kv_valid, bounded=bounded
    )


def _packed_static_fwd(q, k, v, block_q, kv_valid, bounded):
    out, lse = _flash_forward(
        q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
        kv_valid=jnp.asarray(kv_valid, jnp.int32), return_lse=True,
        bounded=bounded,
    )
    return out, (q, k, v, out, lse)


def _packed_static_bwd(block_q, kv_valid, bounded, res, g):
    q, k, v, o, lse = res
    return _flash_backward(
        q, k, v, o, g, lse, DEFAULT_BWD_BLOCK_Q, DEFAULT_BWD_BLOCK_K,
        bounded, kv_valid=jnp.asarray(kv_valid, jnp.int32),
    )


_packed_static_masked.defvjp(_packed_static_fwd, _packed_static_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _packed_masked(q, k, v, kv_valid, block_q, bounded):
    return _flash_packed_forward(
        q, k, v, block_q, kv_valid=kv_valid, bounded=bounded
    )


def _packed_masked_fwd(q, k, v, kv_valid, block_q, bounded):
    out, lse = _flash_forward(
        q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, kv_valid=kv_valid,
        return_lse=True, bounded=bounded,
    )
    return out, (q, k, v, kv_valid, out, lse)


def _packed_masked_bwd(block_q, bounded, res, g):
    import numpy as _np

    q, k, v, kv_valid, o, lse = res
    dq, dk, dv = _flash_backward(
        q, k, v, o, g, lse, DEFAULT_BWD_BLOCK_Q, DEFAULT_BWD_BLOCK_K,
        bounded, kv_valid=kv_valid,
    )
    return dq, dk, dv, _np.zeros((), jax.dtypes.float0)


_packed_masked.defvjp(_packed_masked_fwd, _packed_masked_bwd)


# ---------------------------------------------------------------------------
# packed-heads (token-major) STREAMING forward: global-attention shapes
# ---------------------------------------------------------------------------
#
# Extends the packed-heads idea to sequences whose key axis does NOT fit one
# VMEM block (global attention: N = S*1374, e.g. 10992 at S=8): q/k/v stay in
# their natural token-major (B, N, H*D) layout and the kernel streams key
# blocks with the bounded fixed-max accumulation (acc carried in VMEM
# scratch across the innermost key grid axis).
#
# The grid runs over HEAD PAIRS (B * H/2): at D=64 a pair of adjacent heads
# spans exactly one 128-lane tile of the token-major (B, N, H*D) array, so
# every BlockSpec slices lane-tile-aligned (1, block, 128) windows straight
# out of the qkv matmul's output — no HBM relayout anywhere — while the
# per-invocation working set stays as small as the head-major kernel's
# (one pair's lanes, NOT the full 1024-lane channel axis). That small
# footprint is what buys the big (768, 2048) blocks: a whole-C variant was
# capped at (256, 512) by VMEM and re-streamed K/V 43x per layer at S=8
# (~2 GB of HBM traffic) — measured SLOWER than head-major despite saving
# the relayouts. Don't go back.
#
# What it eliminates per global-attention layer vs the head-major path:
#   - the four (B, N, H, D) <-> (BH, N, D) HBM relayout passes,
#   - the out-of-kernel q quantisation passes (q is quantised in-kernel at
#     ki == 0 from a per-lane inverse-scale row; k is quantised token-major
#     outside — a fused elementwise pass with NO transpose — and its int8
#     DMA blocks are half the bytes),
#   - the head-major packed-v build: the row-sum fold column lives in an
#     extended (B, Nk, H*128) V built with ONE concatenate (v | ones | 0),
#     the same bytes the head-major kernel's 64->128 lane fold pads to.
#
# BOUNDED-ONLY by design: the serving configs that reach global attention all
# certify the qk-norm logit bound (bounded_attn_logits), and the running-max
# variant would keep per-pair max state + an acc rescale pass per block —
# the head-major kernel already serves that fallback. Forward-only for the
# same reason as the packed kernel: AD routes through the head-major kernel
# whose fused backward needs head-major residuals anyway.

DEFAULT_STREAM_BLOCK_Q = 768
DEFAULT_STREAM_BLOCK_K = 2048


def _flash_packed_stream_kernel(
    *refs, num_heads, head_dim, scale, n_keys, block_k, dynamic_valid,
    qk_int8,
):
    if qk_int8:
        c_ref, *refs = refs  # (B, H) fp32 SMEM: per-head dequant scales
    if dynamic_valid:
        nv_ref, *refs = refs  # (1, 1) int32 SMEM: valid-key count
    else:
        nv_ref = None
    if qk_int8:
        qinv_ref, q_ref, k_ref, v_ref, o_ref, qs0_scr, qs1_scr, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, o_ref, qs0_scr, qs1_scr, acc_scr = refs
    npr = num_heads // 2
    b = pl.program_id(0) // npr
    pr = pl.program_id(0) % npr
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if qk_int8:
            # quantise the q tile in-kernel: ONE pass over q per layer
            # (the q block is revisited across ki but this runs at ki == 0
            # only), against per-head scales pre-broadcast to a 128-lane
            # inverse-scale row. |q|/scale <= 127 exactly for rows the
            # scale saw; rows >= kv_valid were excluded from the scale and
            # must clip.
            r = jnp.round(q_ref[0].astype(jnp.float32) * qinv_ref[0])
            if dynamic_valid:
                r = jnp.clip(r, -127.0, 127.0)
        else:
            # fold the softmax scale into q once (one 128-lane pass, not
            # per-head Nk-wide passes over score tiles)
            r = q_ref[0].astype(jnp.float32) * scale
        # TWO zero-padded q tiles, [q_h0 | 0] and [0 | q_h1]: each head's
        # score matmul then contracts the FULL 128-lane pair tile against
        # the UNSLICED k block — the zeroed half kills the cross-head
        # terms, and a 128-deep contraction costs the same MXU time as a
        # 64-deep one (the systolic array is 128 deep either way). The
        # alternative — slicing 64 lanes out of packed 128-lane operands
        # per matmul — pays a cross-lane extraction pass on BOTH operands
        # of EVERY score matmul (measured ~11% slower end-to-end).
        first = jax.lax.broadcasted_iota(
            jnp.int32, (1, 2 * head_dim), 1
        ) < head_dim
        zero = jnp.zeros_like(r)
        qs0_scr[:] = jnp.where(first, r, zero).astype(qs0_scr.dtype)
        qs1_scr[:] = jnp.where(first, zero, r).astype(qs1_scr.dtype)

    k = k_ref[0]  # (bk, 128) int8 (qk_int8) or bf16: this pair's k lanes
    v = v_ref[0]  # (bk, 256): this pair's extended-v lanes

    def body(masked):
        if masked:
            nv = nv_ref[0, 0] if dynamic_valid else n_keys
            key_idx = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            invalid = key_idx >= nv  # (1, bk), broadcast over query rows
        for h, qs_scr in ((0, qs0_scr), (1, qs1_scr)):
            if qk_int8:
                s = jax.lax.dot_general(
                    qs_scr[:], k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * c_ref[b, 2 * pr + h]  # (bq, bk)
            else:
                s = jax.lax.dot_general(
                    qs_scr[:], k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if masked:
                s = jnp.where(invalid, _NEG_INF, s)
            # bounded fixed-max softmax: clamp fuses into the exp chain
            p = jnp.exp(jnp.minimum(s, _BOUNDED_CLAMP))
            # this head's extended-v lanes: [v_h | ones | zeros] — lane D
            # of `both` is rowsum(p), the folded softmax denominator
            both = jax.lax.dot_general(
                p.astype(v.dtype), v[:, h * _LANES:(h + 1) * _LANES],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, 128)
            acc_scr[:, h * _LANES:(h + 1) * _LANES] += both

    # mask invalid keys: static ragged tail only on the final block (the
    # select pass over every (bq, bk) tile is real VPU cost); dynamic
    # kv_valid masks every block against the runtime scalar
    if dynamic_valid:
        body(True)
    elif n_keys % block_k != 0:
        @pl.when(ki == nk - 1)
        def _():
            body(True)

        @pl.when(ki != nk - 1)
        def _():
            body(False)
    else:
        body(False)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = jnp.concatenate(
            [
                acc_scr[:, h * _LANES:h * _LANES + head_dim]
                / acc_scr[:, h * _LANES + head_dim:h * _LANES + head_dim + 1]
                for h in range(2)
            ],
            axis=-1,
        ).astype(o_ref.dtype)


def quant_k_token_major(k, amax_reduce=None):
    """(B, Nk, H, D) float -> ((B, Nk, H*D) int8 token-major, (B, H) fp32
    per-head scales): the stream kernel's K quantisation, exposed so the
    sharded allgather strategy can quantise LOCAL K shards (with a pmax
    amax_reduce making the scales — and so the int8 grid — identical to
    quantising the gathered array) and gather int8: half the K bytes on
    ICI, 1/n_dev the quant work. A cross-device max only grows the scale,
    so no clip is needed."""
    B, Nk, H, D = k.shape
    amax = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(1, 3))  # (B, H)
    if amax_reduce is not None:
        amax = amax_reduce(amax)
    k_scale = jnp.maximum(amax, 1e-30) / 127.0
    kinv = jnp.repeat(1.0 / k_scale, D, axis=-1)[:, None, :]  # (B, 1, C)
    k8 = jnp.round(k.reshape(B, Nk, H * D).astype(jnp.float32) * kinv)
    return k8.astype(jnp.int8), k_scale


def _flash_packed_stream_forward(
    q, k, v, block_q, block_k, kv_valid=None, qk_int8=False, k_quant=None
):
    B, N, H, D = q.shape
    C = H * D
    scale = D**-0.5
    dynamic_valid = kv_valid is not None
    if D != 64 or H % 2:
        raise ValueError(
            "the streaming kernel packs head PAIRS into 128-lane tiles: "
            f"D must be 64 and H even, got D={D}, H={H} (stream_eligible "
            "gates dispatch accordingly)"
        )

    if k_quant is not None:
        # pre-quantised token-major K from quant_k_token_major (the sharded
        # allgather pre-gather path); same contract as the head-major
        # kernel's k_quant
        if not qk_int8 or dynamic_valid:
            raise ValueError("k_quant requires qk_int8 and no kv_valid")
        k3, k_scale = k_quant
        Nk = k3.shape[1]
    else:
        Nk = k.shape[1]
        # contiguous view of the token-major activation — no data movement
        k3 = k.reshape(B, Nk, C)
    q3 = q.reshape(B, N, C)
    # extended V: [v_h | ones | zeros] per head, 128 lanes each — the
    # ones column at lane D folds the softmax row sum into the p @ v
    # matmul (same padded bytes the head-major kernel's 64->128 lane fold
    # streams). ONE concatenate so XLA emits a single fused write; a
    # per-head in-kernel tail concat was 16 VPU copies per key block.
    ve = jnp.concatenate(
        [
            v.astype(v.dtype),
            jnp.ones((B, Nk, H, 1), v.dtype),
            jnp.zeros((B, Nk, H, _LANES - D - 1), v.dtype),
        ],
        axis=-1,
    ).reshape(B, Nk, H * _LANES)

    block_q = _pick_block(N, block_q or DEFAULT_STREAM_BLOCK_Q, 8)
    block_k = _pick_block(Nk, block_k or DEFAULT_STREAM_BLOCK_K, 128)

    inputs, pre_specs = [], []
    if qk_int8:
        # per-head symmetric max-abs scales; rows >= kv_valid excluded (and
        # clipped after round) exactly like _quant_per_head — bucketed
        # serving pads frames with garbage activations
        qa = jnp.abs(q.astype(jnp.float32))
        if dynamic_valid:
            qa = jnp.where(
                jnp.arange(N)[None, :, None, None] < kv_valid, qa, 0.0
            )
        q_scale = jnp.maximum(jnp.max(qa, axis=(1, 3)), 1e-30) / 127.0
        if k_quant is None:
            ka = jnp.abs(k.astype(jnp.float32))
            if dynamic_valid:
                ka = jnp.where(
                    jnp.arange(Nk)[None, :, None, None] < kv_valid, ka, 0.0
                )
            k_scale = jnp.maximum(jnp.max(ka, axis=(1, 3)), 1e-30) / 127.0
            kinv = jnp.repeat(1.0 / k_scale, D, axis=-1)[:, None, :]
            # k quantises token-major OUTSIDE (one fused elementwise pass,
            # no transpose; q quantises in-kernel at ki == 0) — int8 k
            # blocks then stream at half the DMA bytes
            k8 = jnp.round(k3.astype(jnp.float32) * kinv)
            if dynamic_valid:
                k8 = jnp.clip(k8, -127.0, 127.0)
            k3 = k8.astype(jnp.int8)
        c = (q_scale * k_scale * scale).astype(jnp.float32)  # (B, H)
        # per-lane inverse-scale rows: head h's scale spans its D lanes
        qinv = jnp.repeat(1.0 / q_scale, D, axis=-1)[:, None, :]  # (B, 1, C)
        inputs.append(c)
        pre_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    npr = H // 2  # head pairs: grid axis 0 spans B * npr, b-major
    if dynamic_valid:
        inputs.append(jnp.asarray(kv_valid, jnp.int32).reshape(1, 1))
        pre_specs.append(
            pl.BlockSpec((1, 1), lambda i, qi, ki: (0, 0),
                         memory_space=pltpu.SMEM)
        )
    if qk_int8:
        inputs.append(qinv)
        pre_specs.append(
            pl.BlockSpec(
                (1, 1, 2 * D), lambda i, qi, ki: (i // npr, 0, i % npr)
            )
        )

    pad_q = (-N) % block_q
    pad_k = (-Nk) % block_k
    if pad_q:
        q3 = jnp.pad(q3, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k3 = jnp.pad(k3, ((0, 0), (0, pad_k), (0, 0)))
        ve = jnp.pad(ve, ((0, 0), (0, pad_k), (0, 0)))
    inputs += [q3, k3, ve]

    grid = (B * npr, q3.shape[1] // block_q, k3.shape[1] // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_packed_stream_kernel, num_heads=H, head_dim=D,
            scale=scale, n_keys=Nk, block_k=block_k,
            dynamic_valid=dynamic_valid, qk_int8=qk_int8,
        ),
        grid=grid,
        in_specs=pre_specs + [
            pl.BlockSpec(
                (1, block_q, 2 * D), lambda i, qi, ki: (i // npr, qi, i % npr)
            ),
            pl.BlockSpec(
                (1, block_k, 2 * D), lambda i, qi, ki: (i // npr, ki, i % npr)
            ),
            pl.BlockSpec(
                (1, block_k, 2 * _LANES),
                lambda i, qi, ki: (i // npr, ki, i % npr),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 2 * D), lambda i, qi, ki: (i // npr, qi, i % npr)
        ),
        out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
        scratch_shapes=[
            # two zero-padded q tiles ([q_h0 | 0], [0 | q_h1]): full-lane
            # score-matmul operands, no in-kernel lane extraction
            pltpu.VMEM((block_q, 2 * D), jnp.int8 if qk_int8 else v.dtype),
            pltpu.VMEM((block_q, 2 * D), jnp.int8 if qk_int8 else v.dtype),
            pltpu.VMEM((block_q, 2 * _LANES), jnp.float32),  # acc (+ l fold)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)

    if pad_q:
        out = out[:, :N]
    return out.reshape(B, N, H, D)


def flash_attention_packed_stream(
    q, k, v, block_q=None, block_k=None, kv_valid=None, qk_int8=False,
    k_quant=None,
):
    """Token-major streaming flash attention for long (global-attention)
    sequences under the certified logit bound (bounded softmax only — the
    dispatcher requires bounded_logits; see the section comment).

    qk_int8 runs the score matmuls W8A8 on the 2x-rate int8 MXU with
    per-head max-abs scales — q quantised in-kernel, k quantised token-major
    outside (serving-only forward: no VJP, mirroring flash_attention's
    qk_int8 contract). k_quant optionally supplies K pre-quantised by
    quant_k_token_major (the sharded pre-gather path). The bf16 path is
    differentiable: AD routes the forward through the head-major kernel
    whose fused backward needs head-major residuals anyway."""
    if qk_int8:
        return _flash_packed_stream_forward(
            q, k, v, block_q, block_k, kv_valid=kv_valid, qk_int8=True,
            k_quant=k_quant,
        )
    if k_quant is not None:
        raise ValueError("k_quant requires qk_int8")
    if kv_valid is None:
        return _stream_unmasked(q, k, v, block_q, block_k)
    return _stream_masked(
        q, k, v, jnp.asarray(kv_valid, jnp.int32), block_q, block_k
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _stream_unmasked(q, k, v, block_q, block_k):
    return _flash_packed_stream_forward(q, k, v, block_q, block_k)


def _stream_fwd(q, k, v, block_q, block_k):
    out, lse = _flash_forward(
        q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, return_lse=True,
        bounded=True,
    )
    return out, (q, k, v, out, lse)


def _stream_bwd(block_q, block_k, res, g):
    q, k, v, o, lse = res
    return _flash_backward(
        q, k, v, o, g, lse, DEFAULT_BWD_BLOCK_Q, DEFAULT_BWD_BLOCK_K, True
    )


_stream_unmasked.defvjp(_stream_fwd, _stream_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _stream_masked(q, k, v, kv_valid, block_q, block_k):
    return _flash_packed_stream_forward(
        q, k, v, block_q, block_k, kv_valid=kv_valid
    )


def _stream_masked_fwd(q, k, v, kv_valid, block_q, block_k):
    out, lse = _flash_forward(
        q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, kv_valid=kv_valid,
        return_lse=True, bounded=True,
    )
    return out, (q, k, v, kv_valid, out, lse)


def _stream_masked_bwd(block_q, block_k, res, g):
    q, k, v, kv_valid, o, lse = res
    dq, dk, dv = _flash_backward(
        q, k, v, o, g, lse, DEFAULT_BWD_BLOCK_Q, DEFAULT_BWD_BLOCK_K,
        True, kv_valid=kv_valid,
    )
    return dq, dk, dv, np.zeros((), jax.dtypes.float0)


_stream_masked.defvjp(_stream_masked_fwd, _stream_masked_bwd)
