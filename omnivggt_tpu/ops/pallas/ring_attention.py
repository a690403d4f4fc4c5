"""Fused ring flash attention: KV shards rotate between chips with Pallas
inter-chip RDMA while each device accumulates streaming-softmax partials.

This is the ICI-overlap kernel for the sequence-sharded global-attention stage
(SURVEY.md §5/§7): compared to the shard_map + lax.ppermute ring
(parallel/attention.py), the RDMA send is issued *inside* the kernel before the
step's compute, so the transfer of the next KV shard rides ICI underneath the
current block's MXU/VPU work instead of being scheduled by XLA between layers.

Two variants, dispatched by `ring_flash_attention` on the per-device shard
length:

  - VMEM-resident (N_local <= 16384 at D=64 bf16): the KV double buffer lives
    entirely in VMEM; softmax state is VMEM-resident for CHUNK_Q query rows
    at a time, so longer shards run the ring once per q chunk.
  - HBM-staged (N_local <= ~28K): the KV ring double buffer lives in HBM (it
    was the VMEM cap), block_k tiles are streamed HBM->VMEM double-buffered
    under the compute, and q + the (m, l, acc) softmax state stay
    VMEM-resident for the whole shard — so the ring makes exactly ONE
    rotation regardless of shard length (minimal ICI traffic). This serves
    the BASELINE 128-view north star: 128*1374/8 = 21,984 tokens/device.

parallel/attention.ring_attention remains the any-size fallback. Both
validated in Pallas TPU interpret mode on the 8-device CPU mesh
(tests/test_ring_kernel.py) — the same code path lowers to real RDMA on
hardware.

Layout per device: q, k, v (BH, N_local, D); grid over BH. Non-causal, so
ring arrival order is irrelevant to the result.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from omnivggt_tpu.ops.pallas.flash_attention import _round_up, to_bhnd as _to_bhnd_global

_NEG_INF = -1e30
# bounded-logits insurance clamp (see ops/pallas/flash_attention.py)
_BOUNDED_CLAMP = 80.0
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
CHUNK_Q = 2048  # q rows whose softmax state is VMEM-resident per ring pass
MAX_LOCAL_SEQ = 16384  # VMEM-resident KV double-buffer cap at D=64 bf16
# HBM-staged variant: q (2-4B/elem), acc (4B), m/l (64B/row) must fit VMEM
# together (~nl * 450B at D=64 fp32) — 28672 = 56 * 512 keeps headroom.
# Extending the fused cap further (a q-chunked HBM ring) is a documented
# roofline-backed negative: beyond this cap the unfused ppermute ring's
# per-step comm is hidden under per-step attention compute by >40x
# (167 views: 1.3 ms vs 56 ms; 256: 2.0 vs 132 — see ROADMAP + the bench
# roofline), so in-kernel RDMA overlap has <2.5% to recover while paying
# nl/CHUNK_Q extra rotations. Don't retry without multi-chip measurements.
MAX_LOCAL_SEQ_HBM = 28672


def hbm_ring_padded_len(
    nl: int, block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K
) -> int:
    """Per-device shard length after the HBM-staged kernel's internal
    padding (round up to lcm(block_q, block_k)) — the value checked against
    MAX_LOCAL_SEQ_HBM. Single source of truth for the dispatcher
    (parallel/attention.fused_ring_attention) and the bench roofline."""
    return _round_up(nl, math.lcm(block_q, block_k))


def fits_hbm_ring(
    nl: int, block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K
) -> bool:
    return hbm_ring_padded_len(nl, block_q, block_k) <= MAX_LOCAL_SEQ_HBM


def _ring_neighbors(axis_name: str, n_dev: int):
    """Ring-axis coordinates of the right/left neighbours. The kernels'
    shard_maps are manual over the ring axis ONLY (axis_names={seq_axis}),
    so a scalar MESH-typed device id is unambiguous even when the model's
    full mesh has more axes (data, seq) — the data axis stays automatic."""
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, n_dev)
    left = jax.lax.rem(my + n_dev - 1, n_dev)
    return right, left


def _ring_kernel(
    *refs,  # [c (BH, 2) SMEM when qk_int8] q, k, v in; o out; then scratch
    axis_name: str,
    n_dev: int,
    scale: float,
    block_q: int,
    block_k: int,
    handshake: bool,
    bounded: bool = False,
    qk_int8: bool = False,
):
    # qk_int8: q/k/v arrive int8 (per-head scales). c column 0 holds
    # q_scale * k_scale * softmax scale (dequants the int32 score matmul,
    # fused into the exp chain); column 1 holds v_scale, folded into the
    # final acc / l normalisation — so the int8 ring ships HALF the ICI
    # bytes per rotation and pays only an int8->bf16 convert per v tile.
    if qk_int8:
        c_ref, *refs = refs
    else:
        c_ref = None
    (
        q_ref,  # (1, Nl, D) VMEM (current bh slice)
        k_ref,  # (1, Nl, D) VMEM
        v_ref,  # (1, Nl, D) VMEM
        o_ref,  # (1, Nl, D) VMEM out
        kv_buf,  # (2, 2, Nl, D) VMEM scratch: [slot][k|v]
        *scr,  # [m (chunk,128) f32 — unless bounded], l (chunk,128), acc
        # (chunk, D), then send/recv/ready semaphores
    ) = refs
    # bounded mode runs the softmax at a fixed max of 0 — the running-max
    # scratch is not allocated at all (VMEM headroom goes to the KV buffer)
    m_scr = None if bounded else scr[0]
    l_scr, acc_scr, send_sem, recv_sem, ready_sem = scr[-5:]
    right, left = _ring_neighbors(axis_name, n_dev)
    b = pl.program_id(0)

    nl = q_ref.shape[1]
    chunk = l_scr.shape[0]  # q rows whose softmax state is VMEM-resident
    n_chunks = nl // chunk
    nq = chunk // block_q
    nk = nl // block_k

    # The softmax state (m, l, acc) only fits VMEM for `chunk` query rows at a
    # time, so the KV ring makes one full rotation per q chunk (the shard
    # returns to a copy of its origin by reloading from k_ref/v_ref).
    for ci in range(n_chunks):
        q_base = ci * chunk
        kv_buf[0, 0] = k_ref[0]
        kv_buf[0, 1] = v_ref[0]
        if m_scr is not None:
            m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

        for step in range(n_dev):
            slot = step % 2
            nslot = (step + 1) % 2
            if step + 1 < n_dev:
                # capacity handshake: ring skew is only bounded transitively
                # (a device can run up to n_dev-1 steps ahead of its right
                # neighbour), so with 2 buffer slots a sender must not
                # overwrite the receiver's nslot until the receiver is done
                # with it. Signal our LEFT neighbour (who sends to us) that
                # our nslot is consumable, then wait for the matching
                # clearance from our RIGHT neighbour before sending.
                # (Interpret mode lacks remote signals and executes
                # deterministically — handshake=False there.)
                if handshake:
                    pltpu.semaphore_signal(
                        ready_sem, inc=1, device_id=left,
                        device_id_type=pltpu.DeviceIdType.MESH,
                    )
                    pltpu.semaphore_wait(ready_sem, 1)
                rdma = pltpu.make_async_remote_copy(
                    src_ref=kv_buf.at[slot],
                    dst_ref=kv_buf.at[nslot],
                    send_sem=send_sem.at[slot],
                    recv_sem=recv_sem.at[nslot],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.MESH,
                )
                rdma.start()

            def q_tile_body(qi, _):
                if qk_int8:
                    q = q_ref[0, pl.ds(q_base + qi * block_q, block_q), :]
                else:
                    q = q_ref[
                        0, pl.ds(q_base + qi * block_q, block_q), :
                    ].astype(jnp.float32) * scale
                    q = q.astype(k_ref.dtype)
                l = l_scr[pl.ds(qi * block_q, block_q), :1]
                acc = acc_scr[pl.ds(qi * block_q, block_q), :]

                def score(ki):
                    k = kv_buf[slot, 0, pl.ds(ki * block_k, block_k), :]
                    if qk_int8:
                        return jax.lax.dot_general(
                            q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        ).astype(jnp.float32) * c_ref[b, 0]
                    return jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                def v_tile(ki):
                    v = kv_buf[slot, 1, pl.ds(ki * block_k, block_k), :]
                    # int8 v converts for the MXU; its scale is folded into
                    # the final acc / l normalisation (per-head scalar)
                    return v.astype(jnp.bfloat16) if qk_int8 else v

                def k_tile_body(ki, carry):
                    m, l, acc = carry
                    s = score(ki)
                    v = v_tile(ki)
                    m_curr = jnp.max(s, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m, m_curr)
                    p = jnp.exp(s - m_new)
                    corr = jnp.exp(m - m_new)
                    l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
                    acc_new = acc * corr + jax.lax.dot_general(
                        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return m_new, l_new, acc_new

                def k_tile_body_bounded(ki, carry):
                    # softmax at a fixed max of 0 (clamp = overflow insurance)
                    l, acc = carry
                    s = score(ki)
                    v = v_tile(ki)
                    p = jnp.exp(jnp.minimum(s, _BOUNDED_CLAMP))
                    l_new = l + jnp.sum(p, axis=-1, keepdims=True)
                    acc_new = acc + jax.lax.dot_general(
                        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return l_new, acc_new

                if bounded:
                    l, acc = jax.lax.fori_loop(
                        0, nk, k_tile_body_bounded, (l, acc)
                    )
                else:
                    m = m_scr[pl.ds(qi * block_q, block_q), :1]
                    m, l, acc = jax.lax.fori_loop(
                        0, nk, k_tile_body, (m, l, acc)
                    )
                    m_scr[pl.ds(qi * block_q, block_q), :] = jnp.broadcast_to(
                        m, (block_q, m_scr.shape[1])
                    )
                l_scr[pl.ds(qi * block_q, block_q), :] = jnp.broadcast_to(
                    l, (block_q, l_scr.shape[1])
                )
                acc_scr[pl.ds(qi * block_q, block_q), :] = acc
                return ()

            jax.lax.fori_loop(0, nq, q_tile_body, ())

            if step + 1 < n_dev:
                rdma.wait()  # send + recv complete before the slots swap roles

        o_chunk = acc_scr[:] / l_scr[:, :1]
        if qk_int8:
            o_chunk = o_chunk * c_ref[b, 1]  # fold the per-head v scale in
        o_ref[0, pl.ds(q_base, chunk), :] = o_chunk.astype(o_ref.dtype)


def _ring_hbm_kernel(
    *refs,
    axis_name: str,
    n_dev: int,
    scale: float,
    nl_valid: int,
    block_q: int,
    block_k: int,
    handshake: bool,
    bounded: bool = False,
    qk_int8: bool = False,
):
    # ref order: [c (BH, 2) SMEM when qk_int8], q/k/v HBM in, o HBM out,
    # then the scratch below. int8 mode: see _ring_kernel — half the ICI
    # bytes per rotation, half the HBM ring footprint.
    if qk_int8:
        c_ref, *refs = refs
    else:
        c_ref = None
    (
        q_hbm,  # (BH, nl_pad, D) ANY/HBM
        k_hbm,
        v_hbm,
        o_hbm,  # (BH, nl_pad, D) ANY/HBM out
        kv_ring,  # (2, 2, nl_pad, D) HBM ring double buffer: [slot][k|v]
        q_vmem,  # (nl_pad, D) — whole local q resident
        kt,  # (2, block_k, D) streamed K tiles
        vt,  # (2, block_k, D) streamed V tiles
        o_stage,  # (block_q, D) output staging
        *scr,  # [m (nl_pad,8) f32 — unless bounded], l (nl_pad,8),
        # acc (nl_pad,D), then in/tile/out/send/recv/ready semaphores
    ) = refs
    m_scr = None if bounded else scr[0]
    (l_scr, acc_scr, in_sem, tile_sem, out_sem, send_sem, recv_sem,
     ready_sem) = scr[-8:]
    b = pl.program_id(0)
    right, left = _ring_neighbors(axis_name, n_dev)

    nl_pad, D = q_vmem.shape
    nq = nl_pad // block_q
    nk = nl_pad // block_k

    cp_q = pltpu.make_async_copy(q_hbm.at[b], q_vmem, in_sem.at[0])
    cp_k = pltpu.make_async_copy(k_hbm.at[b], kv_ring.at[0, 0], in_sem.at[1])
    cp_v = pltpu.make_async_copy(v_hbm.at[b], kv_ring.at[0, 1], in_sem.at[2])
    cp_q.start()
    cp_k.start()
    cp_v.start()
    cp_q.wait()
    cp_k.wait()
    cp_v.wait()

    if m_scr is not None:
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    def tile_copies(slot, ki, buf):
        return (
            pltpu.make_async_copy(
                kv_ring.at[slot, 0, pl.ds(ki * block_k, block_k)],
                kt.at[buf],
                tile_sem.at[buf],
            ),
            pltpu.make_async_copy(
                kv_ring.at[slot, 1, pl.ds(ki * block_k, block_k)],
                vt.at[buf],
                tile_sem.at[2 + buf],
            ),
        )

    for step in range(n_dev):
        slot = step % 2
        nslot = (step + 1) % 2
        if step + 1 < n_dev:
            # capacity handshake: bound ring skew so a sender never
            # overwrites a receive slot still being read (see the VMEM
            # kernel's comment; interpret mode is deterministic and lacks
            # remote signals — handshake=False there)
            if handshake:
                pltpu.semaphore_signal(
                    ready_sem, inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.MESH,
                )
                pltpu.semaphore_wait(ready_sem, 1)
            rdma = pltpu.make_async_remote_copy(
                src_ref=kv_ring.at[slot],
                dst_ref=kv_ring.at[nslot],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[nslot],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            rdma.start()  # HBM->HBM RDMA rides ICI under this step's compute

        # ragged shards need key masking on tiles past nl_valid; with a
        # traced tile index the condition is dynamic, so pay the masking
        # pass on every tile but ONLY when the shard is actually padded
        ragged = nl_pad > nl_valid

        first_k, first_v = tile_copies(slot, 0, 0)
        first_k.start()
        first_v.start()

        def ki_body(ki, _):
            # double-buffered HBM->VMEM tile streaming with a traced slot
            buf = jax.lax.rem(ki, 2)

            @pl.when(ki + 1 < nk)
            def _():
                nck, ncv = tile_copies(slot, ki + 1, jax.lax.rem(ki + 1, 2))
                nck.start()
                ncv.start()

            ck, cv = tile_copies(slot, ki, buf)
            ck.wait()
            cv.wait()
            k_tile = kt[buf]
            v_tile = vt[buf].astype(jnp.bfloat16) if qk_int8 else vt[buf]

            def q_body(qi, _):
                if qk_int8:
                    s = jax.lax.dot_general(
                        q_vmem[pl.ds(qi * block_q, block_q), :],
                        k_tile,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * c_ref[b, 0]  # (bq, bk)
                else:
                    q = q_vmem[pl.ds(qi * block_q, block_q), :].astype(
                        jnp.float32
                    ) * scale
                    s = jax.lax.dot_general(
                        q.astype(k_tile.dtype),
                        k_tile,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (bq, bk)
                if ragged:
                    key_idx = ki * block_k + jax.lax.broadcasted_iota(
                        jnp.int32, s.shape, 1
                    )
                    s = jnp.where(key_idx < nl_valid, s, _NEG_INF)
                l_prev = l_scr[pl.ds(qi * block_q, block_q), :1]
                acc_prev = acc_scr[pl.ds(qi * block_q, block_q), :]
                if bounded:
                    # fixed-max softmax (clamp = overflow insurance)
                    p = jnp.exp(jnp.minimum(s, _BOUNDED_CLAMP))
                    l_next = l_prev + jnp.sum(p, axis=-1, keepdims=True)
                    acc_next = acc_prev + jax.lax.dot_general(
                        p.astype(v_tile.dtype),
                        v_tile,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    m_prev = m_scr[pl.ds(qi * block_q, block_q), :1]
                    m_curr = jnp.max(s, axis=-1, keepdims=True)
                    m_next = jnp.maximum(m_prev, m_curr)
                    p = jnp.exp(s - m_next)
                    corr = jnp.exp(m_prev - m_next)
                    l_next = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
                    acc_next = acc_prev * corr + jax.lax.dot_general(
                        p.astype(v_tile.dtype),
                        v_tile,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    m_scr[pl.ds(qi * block_q, block_q), :] = jnp.broadcast_to(
                        m_next, (block_q, m_scr.shape[1])
                    )
                l_scr[pl.ds(qi * block_q, block_q), :] = jnp.broadcast_to(
                    l_next, (block_q, l_scr.shape[1])
                )
                acc_scr[pl.ds(qi * block_q, block_q), :] = acc_next
                return ()

            jax.lax.fori_loop(0, nq, q_body, ())
            return ()

        jax.lax.fori_loop(0, nk, ki_body, ())

        if step + 1 < n_dev:
            rdma.wait()  # send + recv complete before the slots swap roles

    for qi in range(nq):
        o_q = (
            acc_scr[pl.ds(qi * block_q, block_q), :]
            / l_scr[pl.ds(qi * block_q, block_q), :1]
        )
        if qk_int8:
            o_q = o_q * c_ref[b, 1]  # fold the per-head v scale in
        o_stage[:] = o_q.astype(o_stage.dtype)
        cp = pltpu.make_async_copy(
            o_stage, o_hbm.at[b, pl.ds(qi * block_q, block_q)], out_sem
        )
        cp.start()
        cp.wait()


def _quant_ring(qf, kf, vf, axis_name, scale):
    """Per-head int8 quantisation for the ring kernels: q uses local
    per-head max-abs scales (it never leaves the device); k and v use
    ring-GLOBAL per-head scales (lax.pmax over the ring axis) so every
    rotating shard shares one int8 grid and the kernel's per-head dequant
    scalar is position-independent. Returns int8 q/k/v plus the (BH, 2)
    scale table the kernels read from SMEM: column 0 = q_s * k_s * softmax
    scale (score dequant), column 1 = v_s (folded into acc / l)."""

    from omnivggt_tpu.ops.pallas.flash_attention import _quant_per_head

    q8, q_s = _quant_per_head(qf)
    # ONE fused pmax for the k and v per-head maxes: two back-to-back tiny
    # (BH,) all-reduces per layer would each pay a latency-bound ICI round
    # trip; stacking them halves the small-collective count on the hot path
    kv_amax = jax.lax.pmax(
        jnp.stack(
            [
                jnp.max(jnp.abs(kf.astype(jnp.float32)), axis=(1, 2)),
                jnp.max(jnp.abs(vf.astype(jnp.float32)), axis=(1, 2)),
            ],
            axis=-1,
        ),
        axis_name,
    )  # (BH, 2)
    kv_s = jnp.maximum(kv_amax, 1e-30) / 127.0
    k_s, v_s = kv_s[:, :1], kv_s[:, 1:]
    k8 = jnp.round(kf.astype(jnp.float32) / k_s[:, :, None]).astype(jnp.int8)
    v8 = jnp.round(vf.astype(jnp.float32) / v_s[:, :, None]).astype(jnp.int8)
    c = jnp.concatenate([q_s * k_s * scale, v_s], axis=1)  # (BH, 2) fp32
    return q8, k8, v8, c


def ring_flash_attention_hbm(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "seq",
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    handshake: bool = None,
    bounded_logits: bool = False,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """HBM-staged exact ring flash attention: per-device shards up to
    MAX_LOCAL_SEQ_HBM tokens, any length (padded + masked internally). One
    ring rotation total.

    qk_int8: W8A8 ring (serving-only) — int8 KV shards HALVE the ICI bytes
    per rotation and the HBM ring footprint; scores run on the 2x-rate int8
    MXU (see _quant_ring for the scale plumbing)."""
    B, N, H, D = q.shape
    n_dev = mesh.shape[seq_axis]
    nl = N // n_dev
    nl_pad = hbm_ring_padded_len(nl, block_q, block_k)
    if nl_pad > MAX_LOCAL_SEQ_HBM:
        raise ValueError(
            f"per-device sequence {nl} (padded {nl_pad}) exceeds the "
            f"HBM-staged cap {MAX_LOCAL_SEQ_HBM}; use "
            f"parallel.attention.ring_attention instead"
        )
    if handshake is None:
        handshake = not interpret
    scale = D**-0.5
    spec = P(None, seq_axis, None, None)

    def per_device(q, k, v):
        def prep(x):
            x = _to_bhnd_global(x)
            if nl_pad > nl:
                x = jnp.pad(x, ((0, 0), (0, nl_pad - nl), (0, 0)))
            return x

        qf, kf, vf = prep(q), prep(k), prep(v)
        inputs = [qf, kf, vf]
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
        kv_dtype = q.dtype
        if qk_int8:
            q8, k8, v8, c = _quant_ring(qf, kf, vf, seq_axis, scale)
            inputs = [c, q8, k8, v8]
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
            kv_dtype = jnp.int8
        out = pl.pallas_call(
            functools.partial(
                _ring_hbm_kernel,
                axis_name=seq_axis,
                n_dev=n_dev,
                scale=scale,
                nl_valid=nl,
                block_q=block_q,
                block_k=block_k,
                handshake=handshake,
                bounded=bounded_logits,
                qk_int8=qk_int8,
            ),
            grid=(B * H,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B * H, nl_pad, D), q.dtype),
            scratch_shapes=[
                pl.ANY((2, 2, nl_pad, D), kv_dtype),  # HBM KV ring
                pltpu.VMEM((nl_pad, D), kv_dtype),  # whole local q
                pltpu.VMEM((2, block_k, D), kv_dtype),  # K tiles
                pltpu.VMEM((2, block_k, D), kv_dtype),  # V tiles
                pltpu.VMEM((block_q, D), q.dtype),  # out staging
                *(
                    []
                    if bounded_logits
                    else [pltpu.VMEM((nl_pad, 8), jnp.float32)]  # m
                ),
                pltpu.VMEM((nl_pad, 8), jnp.float32),  # l
                pltpu.VMEM((nl_pad, D), jnp.float32),  # acc
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR,
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=8,
            ),
            interpret=interpret,
        )(*inputs)
        return out[:, :nl].reshape(B, H, nl, D).transpose(0, 2, 1, 3)

    return shard_map(
        per_device, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        axis_names=frozenset({seq_axis}), check_vma=False,
    )(q, k, v)


def ring_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "seq",
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    chunk_q: int = CHUNK_Q,
    interpret: bool = False,
    handshake: bool = None,
    bounded_logits: bool = False,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """Exact sequence-sharded attention over (B, N, H, D) with N sharded on
    `seq_axis`. Shards that fit the VMEM double buffer (and divide the
    blocks) use the VMEM-resident kernel; longer or ragged shards up to
    MAX_LOCAL_SEQ_HBM use the HBM-staged kernel.

    bounded_logits: caller-guaranteed |scores| << 80 (qk-normed inputs);
    skips the running-max machinery (see flash_attention's docstring). The
    ones-column row-sum fold used there is NOT applied here: it would pad
    the rotating v shard to 128 lanes and double the ICI ring traffic.

    qk_int8: W8A8 ring (serving-only, certified per-checkpoint): int8 KV
    shards halve the ICI bytes per rotation, scores run on the 2x-rate int8
    MXU, k/v use ring-global per-head scales (_quant_ring)."""
    B, N, H, D = q.shape
    n_dev = mesh.shape[seq_axis]
    nl = N // n_dev
    vmem_ok = (
        nl <= MAX_LOCAL_SEQ
        and nl % min(chunk_q, nl) == 0
        and min(chunk_q, nl) % min(block_q, min(chunk_q, nl)) == 0
        and nl % min(block_k, nl) == 0
    )
    if not vmem_ok:
        return ring_flash_attention_hbm(
            q, k, v, mesh, seq_axis,
            block_q=block_q, block_k=block_k,
            interpret=interpret, handshake=handshake,
            bounded_logits=bounded_logits, qk_int8=qk_int8,
        )
    # vmem_ok above already guarantees these divisibilities
    chunk = min(chunk_q, nl)
    block_q = min(block_q, chunk)
    block_k = min(block_k, nl)
    scale = D**-0.5
    if handshake is None:
        handshake = not interpret
    spec = P(None, seq_axis, None, None)

    def per_device(q, k, v):
        qf, kf, vf = (
            _to_bhnd_global(q), _to_bhnd_global(k), _to_bhnd_global(v)
        )
        inputs = [qf, kf, vf]
        in_specs = [
            pl.BlockSpec((1, nl, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nl, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nl, D), lambda b: (b, 0, 0)),
        ]
        kv_dtype = q.dtype
        if qk_int8:
            q8, k8, v8, c = _quant_ring(qf, kf, vf, seq_axis, scale)
            inputs = [c, q8, k8, v8]
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
            kv_dtype = jnp.int8
        out = pl.pallas_call(
            functools.partial(
                _ring_kernel,
                axis_name=seq_axis,
                n_dev=n_dev,
                scale=scale,
                block_q=block_q,
                block_k=block_k,
                handshake=handshake,
                bounded=bounded_logits,
                qk_int8=qk_int8,
            ),
            grid=(B * H,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, nl, D), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * H, nl, D), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, 2, nl, D), kv_dtype),
                *(
                    []
                    if bounded_logits
                    else [pltpu.VMEM((chunk, 128), jnp.float32)]  # m
                ),
                pltpu.VMEM((chunk, 128), jnp.float32),  # l
                pltpu.VMEM((chunk, D), jnp.float32),  # acc
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR,
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=7,
            ),
            interpret=interpret,
        )(*inputs)
        return out.reshape(B, H, nl, D).transpose(0, 2, 1, 3)

    return shard_map(
        per_device, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        axis_names=frozenset({seq_axis}), check_vma=False,
    )(q, k, v)
