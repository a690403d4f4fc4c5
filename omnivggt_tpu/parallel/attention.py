"""Sequence-sharded attention over a device mesh (the SURVEY.md §5
"long-context / sequence parallelism" subsystem the reference lacks).

Two strategies for the global-attention stage, both expressed with shard_map
so the Pallas flash kernel stays usable per shard:

  - all-gather KV ("allgather"): queries stay sharded over the sequence axis;
    K and V are all-gathered across ICI and each device runs local flash
    attention against the full keys. Communication O(N * C), compute balanced.
    The default — on a v5e slice the KV gather rides ICI and overlaps with the
    previous layer's compute.

  - ring ("ring"): K/V blocks rotate around the ring with lax.ppermute while
    each device accumulates streaming-softmax partials (the blockwise flash
    recurrence). Memory O(N_local) per device; communication pipelined with
    compute. Preferred once N * C exceeds the per-chip HBM headroom for a
    gathered KV.

Both take (B, N, H, D) with N sharded over `seq_axis` and return the same
sharding. Exact (not approximate): validated against single-device attention
in tests/test_parallel.py on the 8-device CPU mesh.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from omnivggt_tpu.ops.attention import scaled_dot_product_attention


def _qkv_spec(seq_axis):
    return P(None, seq_axis, None, None)


def allgather_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "seq",
    impl: str = "auto",
    kv_valid=None,
    bounded_logits: bool = False,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """Sequence-sharded attention with all-gathered KV. kv_valid masks keys
    >= kv_valid of the *global* (gathered) sequence — the tiled all_gather
    restores global token order, so the valid prefix stays a prefix.

    qk_int8: per-shard W8A8 flash score matmuls (ops/pallas qk_int8). Each
    device quantises its local q rows with its own per-head scales, so the
    sharded result matches the single-device int8 forward up to the
    shard-local q scales — the same 8-bit noise level the serving
    certification gates. K is quantised BEFORE the gather (local shard,
    pmax-global scales — bit-identical grid to quantising the gathered
    array) so the gather ships int8 K: half the K bytes on ICI and
    1/n_dev of the quant work per device. The kv_valid (bucketed serving)
    path keeps the gather-then-quantise order: its scale masking needs the
    global row index."""
    spec = _qkv_spec(seq_axis)

    if kv_valid is None:
        from omnivggt_tpu.ops.attention import (
            packed_eligible,
            resolve_impl,
            stream_eligible,
        )

        B, N, H, D = q.shape
        n_dev = mesh.shape[seq_axis]
        local_shape = (B, max(N // n_dev, 1), H, D)
        # pre-gather int8 K only when the gathered call would actually run
        # an int8 kernel: if the packed token-major kernel is eligible for
        # (local q, GLOBAL keys), the inner scaled_dot_product_attention
        # dispatches packed-bf16 (which beats head-major int8 at those
        # shapes) and would ignore the int8 grid — keeping this branch
        # would silently change numerics vs the single-device path.
        if qk_int8 and resolve_impl(
            local_shape, impl
        ) == "flash" and stream_eligible(local_shape, N, bounded_logits):
            # token-major pre-gather for the streaming kernel: each device
            # quantises its LOCAL K shard token-major with pmax-global
            # per-head scales (== the scales of the gathered array, so the
            # int8 grid — and the output — is bit-identical to quantising
            # K after the gather), then gathers int8: half the K bytes on
            # ICI and 1/n_dev the quant work. V stays bf16 (the kernel's
            # p @ v consumes bf16; the fold column is built by the kernel
            # wrapper from the gathered V).
            from omnivggt_tpu.ops.pallas.flash_attention import (
                flash_attention_packed_stream,
                quant_k_token_major,
            )

            def inner_stream_q8(q, k, v):
                k8, k_s = quant_k_token_major(
                    k, amax_reduce=lambda a: jax.lax.pmax(a, seq_axis)
                )
                k8_full = jax.lax.all_gather(k8, seq_axis, axis=1, tiled=True)
                v_full = jax.lax.all_gather(v, seq_axis, axis=1, tiled=True)
                return flash_attention_packed_stream(
                    q, None, v_full, qk_int8=True, k_quant=(k8_full, k_s)
                )

            return shard_map(
                inner_stream_q8, mesh=mesh, in_specs=(spec, spec, spec),
                out_specs=spec, check_vma=False,
            )(q, k, v)
        if qk_int8 and resolve_impl(
            (B, max(N // n_dev, 1), H, D), impl
        ) == "flash" and not packed_eligible((B, max(N // n_dev, 1), H, D), N):
            # pre-gather int8 K: each device quantises its LOCAL K shard
            # with pmax-GLOBAL per-head scales (== the scales of the
            # gathered array, so the int8 grid — and the output — is
            # bit-identical to quantising K after the gather), then gathers
            # int8: half the K bytes on ICI and 1/n_dev the quant work.
            # V stays bf16: the kernel's p @ v matmul consumes bf16 and the
            # folded row-sum ones-column doesn't survive an int8 grid.
            from omnivggt_tpu.ops.pallas.flash_attention import (
                _quant_per_head,
                flash_attention,
                to_bhnd,
            )

            def inner_q8(q, k, v):
                k8, k_s = _quant_per_head(
                    to_bhnd(k),
                    amax_reduce=lambda a: jax.lax.pmax(a, seq_axis),
                )
                k8_full = jax.lax.all_gather(k8, seq_axis, axis=1, tiled=True)
                v_full = jax.lax.all_gather(v, seq_axis, axis=1, tiled=True)
                return flash_attention(
                    q, None, v_full, bounded_logits=bounded_logits,
                    qk_int8=True, k_quant=(k8_full, k_s),
                )

            return shard_map(
                inner_q8, mesh=mesh, in_specs=(spec, spec, spec),
                out_specs=spec, check_vma=False,
            )(q, k, v)

        def inner(q, k, v):
            k_full = jax.lax.all_gather(k, seq_axis, axis=1, tiled=True)
            v_full = jax.lax.all_gather(v, seq_axis, axis=1, tiled=True)
            return scaled_dot_product_attention(
                q, k_full, v_full, impl=impl, bounded_logits=bounded_logits,
                qk_int8=qk_int8,
            )

        return shard_map(
            inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )(q, k, v)

    def inner_masked(q, k, v, nv):
        if qk_int8:
            # the flash kernel's per-head quant scales exclude rows >=
            # kv_valid, but q here is a LOCAL shard indexed from this
            # shard's global offset — zero the padded frames' garbage q
            # rows instead (their outputs are discarded by the caller, and
            # zeros cannot perturb the max-abs scales), keeping the
            # padded-forward == unpadded-forward contract on every shard
            nl = q.shape[1]
            start = jax.lax.axis_index(seq_axis) * nl
            row = start + jnp.arange(nl)
            q = jnp.where((row < nv[0])[None, :, None, None], q, 0.0)
        k_full = jax.lax.all_gather(k, seq_axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v, seq_axis, axis=1, tiled=True)
        return scaled_dot_product_attention(
            q, k_full, v_full, impl=impl, kv_valid=nv[0],
            bounded_logits=bounded_logits, qk_int8=qk_int8,
        )

    nv = jnp.asarray(kv_valid, jnp.int32).reshape(1)
    return shard_map(
        inner_masked,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None)),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, nv)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "seq",
    bounded_logits: bool = False,
) -> jnp.ndarray:
    """Sequence-sharded ring attention: KV rotates, each device keeps a
    streaming-softmax (max, denom, acc) carry. Exact.

    bounded_logits (caller-guaranteed |scores| << 80, e.g. qk-normed inputs):
    the softmax runs at a fixed max of 0, dropping the running-max carry and
    its rescale passes."""
    spec = _qkv_spec(seq_axis)

    def inner(q, k, v):
        B, Nq, H, D = q.shape
        n_dev = jax.lax.psum(1, seq_axis)
        scale = D**-0.5
        qf = q.astype(jnp.float32) * scale
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def rotate(k_cur, v_cur):
            return (
                jax.lax.ppermute(k_cur, seq_axis, perm),
                jax.lax.ppermute(v_cur, seq_axis, perm),
            )

        def update(m_prev, d_prev, acc_prev, k_cur, v_cur):
            s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_cur.astype(jnp.float32))
            if bounded_logits:
                p = jnp.exp(jnp.minimum(s, 80.0))
                return None, d_prev + jnp.sum(p, axis=-1), acc_prev + jnp.einsum(
                    "bhqk,bkhd->bhqd", p, v_cur.astype(jnp.float32)
                )
            m_blk = jnp.max(s, axis=-1)
            m_new = jnp.maximum(m_prev, m_blk)
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m_prev - m_new)
            d_new = d_prev * corr + jnp.sum(p, axis=-1)
            acc_new = acc_prev * corr[..., None] + jnp.einsum(
                "bhqk,bkhd->bhqd", p, v_cur.astype(jnp.float32)
            )
            return m_new, d_new, acc_new

        def step(carry, _):
            m_prev, d_prev, acc_prev, k_cur, v_cur = carry
            m_new, d_new, acc_new = update(m_prev, d_prev, acc_prev, k_cur, v_cur)
            # rotate inside the scan (the final shard's rotation is skipped
            # by scanning n_dev - 1 steps and finishing outside)
            k_nxt, v_nxt = rotate(k_cur, v_cur)
            return (m_new, d_new, acc_new, k_nxt, v_nxt), None

        m0 = (
            None if bounded_logits
            else jnp.full((B, H, Nq), -jnp.inf, jnp.float32)
        )
        d0 = jnp.zeros((B, H, Nq), jnp.float32)
        acc0 = jnp.zeros((B, H, Nq, D), jnp.float32)
        if n_dev > 1:
            (m, d, acc, k_last, v_last), _ = jax.lax.scan(
                step, (m0, d0, acc0, k, v), None, length=n_dev - 1
            )
        else:
            m, d, acc, k_last, v_last = m0, d0, acc0, k, v
        # final shard: no rotation — its result would be discarded
        _, d, acc = update(m, d, acc, k_last, v_last)
        out = acc / d[..., None]
        return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)

    return shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def fused_ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "seq",
    bounded_logits: bool = False,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """The Pallas RDMA ring kernel (ops/pallas/ring_attention.py), with
    interpret mode selected automatically off-TPU so the same model code runs
    on the CPU test mesh. Shards beyond the HBM-staged kernel's VMEM cap
    (ops/pallas/ring_attention.MAX_LOCAL_SEQ_HBM, ~166 views on 8 chips)
    fall back to the unfused lax.ppermute ring — logged, not silent.

    qk_int8 (serving-only, certified): the W8A8 ring — int8 KV shards halve
    the rotation's ICI bytes and the scores run on the 2x-rate int8 MXU.
    The unfused fallback ignores it (bf16 einsums), logged above."""
    from omnivggt_tpu.ops.pallas.ring_attention import (
        MAX_LOCAL_SEQ_HBM,
        fits_hbm_ring,
        ring_flash_attention,
    )

    nl = q.shape[1] // mesh.shape[seq_axis]
    if not fits_hbm_ring(nl):
        import logging

        logging.getLogger(__name__).warning(
            "per-device sequence %d exceeds the HBM-staged ring kernel cap "
            "%d; falling back to the unfused ppermute ring (exact, but the "
            "inner loop runs as XLA ops instead of the fused kernel)",
            nl, MAX_LOCAL_SEQ_HBM,
        )
        return ring_attention(
            q, k, v, mesh, seq_axis, bounded_logits=bounded_logits
        )

    return ring_flash_attention(
        q, k, v, mesh, seq_axis, interpret=jax.default_backend() != "tpu",
        bounded_logits=bounded_logits, qk_int8=qk_int8,
    )


def rows_sharded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    rows_spec: P,
    impl: str = "auto",
    kv_valid=None,
    bounded_logits: bool = False,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """Embarrassingly-parallel attention with the batch/rows dim sharded
    (frame attention: each frame attends within itself, no communication).
    shard_map keeps the Pallas kernel usable per shard.

    kv_valid: optional token-level valid prefix WITHIN each row's sequence
    (e.g. dinov2.apply's sublane-alignment padding) — the sequence dim is
    unsharded here, so the same prefix applies on every shard. Static ints
    are closed over; traced scalars rely on shard_map's replicated-closure
    capture."""
    spec = P(rows_spec, None, None, None) if isinstance(rows_spec, (str, tuple)) else rows_spec

    def inner(q, k, v):
        return scaled_dot_product_attention(
            q, k, v, impl=impl, kv_valid=kv_valid,
            bounded_logits=bounded_logits, qk_int8=qk_int8,
        )

    return shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
