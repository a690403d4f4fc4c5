"""Fused flash attention (non-causal) as a Pallas TPU kernel.

TPU equivalent of the torch SDPA flash path the reference relies on
(/root/reference/omnivggt/layers/attention.py:60-66). Streaming softmax over
key blocks keeps memory O(block_q * block_k) in VMEM; the (q @ k^T) and
(p @ v) matmuls ride the MXU with fp32 accumulation.

Layout: (B, N, H, D) in HBM; the kernel runs on (B*H, N, D) with grid
(BH, q_blocks, k_blocks), k innermost so the scratch accumulator carries the
running (max, denom, acc) across key blocks for one q tile.

The backward pass is provided by a custom VJP that recomputes attention with
the XLA blockwise implementation (memory-linear), so the op is differentiable
for training while inference uses the fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
_LANES = 128
# Finite "minus infinity": true -inf scores make the VPU hit special-value
# slow paths (measured ~40x slowdown on v5e); -1e30 underflows exp to 0 at
# full speed and is far below any real logit.
_NEG_INF = -1e30


def _flash_kernel(
    *refs, scale, n_keys, block_k, dynamic_valid
):
    if dynamic_valid:
        # kv_valid: (1, 1) int32 in SMEM — number of valid (unmasked) keys
        nv_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
        nv_ref = None
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # fold the softmax scale into the (bq, D) q tile — a D-wide pass instead
    # of a bk-wide pass over the score tile (VPU-bound kernel; every pass
    # over (bq, bk) data costs ~2 ms across the grid)
    q = q_ref[0].astype(jnp.float32) * scale  # (bq, D)
    k = k_ref[0]  # (bk, D)
    s = jax.lax.dot_general(
        q.astype(k.dtype),
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)

    # mask invalid keys. Static case: only the final block can contain
    # (zero-)padding, and only when n_keys is not a multiple of block_k.
    # Dynamic case (kv_valid given): the valid-key count is a runtime scalar,
    # so every block masks against it (one extra VPU pass over the score tile).
    if dynamic_valid:
        key_idx = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_idx < nv_ref[0, 0], s, _NEG_INF)
    elif n_keys % block_k != 0:
        key_idx = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_idx < n_keys, s, _NEG_INF)

    m_prev = m_scr[:, :1]  # (bq, 1)
    l_prev = l_scr[:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    p = jnp.exp(s - m_next)
    corr = jnp.exp(m_prev - m_next)
    l_next = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_forward(q, k, v, block_q, block_k, kv_valid=None):
    B, N, H, D = q.shape
    Nk = k.shape[1]
    scale = D**-0.5

    # (B, N, H, D) -> (B*H, N, D)
    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], D)

    qf, kf, vf = to_bhnd(q), to_bhnd(k), to_bhnd(v)

    block_q = min(block_q, max(_round_up(N, 8), 8))
    block_k = min(block_k, max(_round_up(Nk, 128), 128))
    pad_q = (-N) % block_q
    pad_k = (-Nk) % block_k
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))

    grid = (B * H, qf.shape[1] // block_q, kf.shape[1] // block_k)
    dynamic_valid = kv_valid is not None

    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
        pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
        pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
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

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, n_keys=Nk, block_k=block_k,
            dynamic_valid=dynamic_valid,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)

    if pad_q:
        out = out[:, :N]
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)


def _round_up(x, m):
    return -(-x // m) * m


def flash_attention(
    q, k, v, block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K, kv_valid=None
):
    """Non-causal flash attention over (B, N, H, D) tensors; differentiable.

    kv_valid: optional traced int32 scalar — keys >= kv_valid are masked
    (valid-prefix masking for bucketed serving)."""
    if kv_valid is None:
        return _flash_unmasked(q, k, v, block_q, block_k)
    return _flash_masked(q, k, v, jnp.asarray(kv_valid, jnp.int32), block_q, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_unmasked(q, k, v, block_q, block_k):
    return _flash_forward(q, k, v, block_q, block_k)


def _fwd(q, k, v, block_q, block_k):
    return _flash_forward(q, k, v, block_q, block_k), (q, k, v)


def _bwd(block_q, block_k, res, g):
    from omnivggt_tpu.ops.attention import _attention_blockwise

    q, k, v = res
    _, vjp = jax.vjp(_attention_blockwise, q, k, v)
    return vjp(g)


_flash_unmasked.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_masked(q, k, v, kv_valid, block_q, block_k):
    return _flash_forward(q, k, v, block_q, block_k, kv_valid=kv_valid)


def _masked_fwd(q, k, v, kv_valid, block_q, block_k):
    out = _flash_forward(q, k, v, block_q, block_k, kv_valid=kv_valid)
    return out, (q, k, v, kv_valid)


def _masked_bwd(block_q, block_k, res, g):
    import numpy as _np

    from omnivggt_tpu.ops.attention import _attention_blockwise

    q, k, v, kv_valid = res
    _, vjp = jax.vjp(
        lambda q, k, v: _attention_blockwise(q, k, v, kv_valid=kv_valid), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, _np.zeros((), jax.dtypes.float0)


_flash_masked.defvjp(_masked_fwd, _masked_bwd)
