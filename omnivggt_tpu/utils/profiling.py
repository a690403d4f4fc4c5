"""Tracing / profiling subsystem (SURVEY.md §5: absent in the reference beyond
a flops() estimator; this is the TPU-native replacement).

  - `annotate(name)`: jax.profiler.TraceAnnotation context for stage-level
    attribution in TensorBoard/Perfetto traces.
  - `trace(logdir)`: capture a device trace around a code block.
  - `Timer` / `timed`: wall-clock stage timing with forced materialisation
    (on tunneled backends block_until_ready alone does not wait — see
    tests/.claude verify notes).
  - `flops_estimate(cfg, S, H, W)`: analytic forward-FLOPs for the model, for
    roofline comparisons in bench reports.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np
import jax


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(tree):
    """Materialise a pytree on the host (reliable completion barrier)."""
    return jax.tree.map(lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


class _Section:
    """Handle yielded by Timer.section: call .set(out) with the block's
    device outputs so the timer can force them before stopping the clock —
    a `result=` passed at context ENTRY cannot reference values the block
    hasn't produced yet, and timing without forcing measures dispatch only
    on this tunneled backend."""

    def __init__(self):
        self.value = None

    def set(self, value):
        self.value = value
        return value


class Timer:
    """Accumulating named wall-clock timers.

        t = Timer()
        with t.section("fwd") as s:
            s.set(jit_f(x))     # forced (host-materialised) before the stop
        print(t.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        handle = _Section()
        try:
            yield handle
        finally:
            if handle.value is not None:
                force(handle.value)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1


@contextlib.contextmanager
def timed(name: str):
    """One-off timed block printing '<name>: X ms'; yields a _Section whose
    .set(out) forces device outputs before the clock stops."""
    t0 = time.perf_counter()
    handle = _Section()
    try:
        yield handle
    finally:
        if handle.value is not None:
            force(handle.value)
        print(f"{name}: {(time.perf_counter() - t0) * 1000:.1f} ms")

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total*1000:.1f} ms total, {total/n*1000:.2f} ms/call x{n}")
        return "\n".join(lines)


def flops_estimate(cfg, S: int, H: Optional[int] = None, W: Optional[int] = None) -> float:
    """Analytic forward FLOPs (multiply-accumulate = 2 FLOPs) of the flagship
    path: DINOv2 embedder + alternating aggregator + heads (dense layers and
    attention; convs in the DPT heads approximated)."""
    H = H or cfg.img_size
    W = W or cfg.img_size
    a = cfg.aggregator
    p = a.patch_size
    n_patch = (H // p) * (W // p)
    P = a.patch_start_idx + n_patch
    C = a.embed_dim

    def block_flops(n_tokens, dim, mlp_ratio=4.0):
        attn_proj = 2 * n_tokens * dim * dim * 4  # qkv (3) + out (1)
        attn_sdpa = 2 * 2 * n_tokens * n_tokens * dim
        mlp = 2 * n_tokens * dim * dim * mlp_ratio * 2
        return attn_proj + attn_sdpa + mlp

    b = a.backbone if a.patch_embed != "conv" else None
    vit = 0.0
    if b is not None:
        vit_tokens = 1 + b.num_register_tokens + n_patch
        vit = b.depth * block_flops(vit_tokens, b.embed_dim, b.mlp_ratio) * S
        vit += 2 * n_patch * (p * p * 3) * b.embed_dim * S  # patchify

    frame = a.depth * block_flops(P, C, a.mlp_ratio) * S
    glob = a.depth * block_flops(S * P, C, a.mlp_ratio)

    # DPT heads (two): per-level projections + fusion convs, rough
    dpt = 2 * S * (
        2 * n_patch * 2 * C * sum(cfg.depth_head.out_channels)
        + 2 * (H * W) * cfg.depth_head.features * cfg.depth_head.features * 9 * 2
    )
    camera = cfg.camera_head.num_iterations * cfg.camera_head.trunk_depth * block_flops(
        S, cfg.camera_head.dim_in
    )
    return float(vit + frame + glob + dpt + camera)


def sharded_attention_roofline(
    n_dev: int = 8,
    views=(64, 128, 167, 256),
    tokens_per_frame: int = 1374,
    num_heads: int = 16,
    head_dim: int = 64,
    embed_dim: int = 1024,
    ici_bytes_per_s: float = 9.0e10,
    flash_flops_per_s: float = 60e12,
    flash_int8_flops_per_s: float = 102e12,
    matmul_flops_per_s: float = 175e12,
    bytes_per_elem: int = 2,
):
    """Analytic allgather-vs-ring roofline for the sequence-sharded global
    attention (one aggregator layer, per device) — the numbers a real
    multi-chip run must confirm or refute (BENCH report / ROADMAP).

    Assumptions (v5e defaults): a bidirectional ring on one ICI torus axis
    (2 x 45 GB/s per chip), the measured Pallas flash throughput (60 TFLOP/s
    bf16, 102 TFLOP/s int8-qk at the D=64 global-attention shape) and the
    measured amortised matmul throughput (175 TFLOP/s), bf16 activations.
    The allgather path runs the local int8-qk flash kernel when the serving
    config certifies attn_quant (per_layer['attn_int8_ms']); the fused ring
    kernels also take attn_quant (int8 KV shards with ring-global per-head
    scales — HALF the ICI bytes per rotation: ring_step_comm_int8_ms and
    ring_comm_hidden_int8 model that, with the int8-vs-bf16 hiding
    comparison done against the int8 kernel's own higher compute rate). The
    on-hardware int8 ring compute rate is unmeasured (no multi-chip slice
    here), so flash_int8_flops_per_s extrapolates the single-chip kernel
    measurement.

      - allgather: each device receives (n_dev-1)/n_dev of the full K+V once
        per layer; XLA can overlap the gather with the previous layer's
        compute, so the figure of merit is comm time / compute time.
      - ring: KV rotates in n_dev-1 steps; the rotation is hidden iff the
        per-step transfer fits under the per-step attention compute.
      - hbm_ring_ok: whether the per-device shard still fits the HBM-staged
        Pallas ring kernel (ops/pallas/ring_attention.MAX_LOCAL_SEQ_HBM);
        beyond it the unfused lax.ppermute ring takes over (logged fallback,
        parallel/attention.fused_ring_attention).
    """
    import math

    from omnivggt_tpu.ops.pallas.ring_attention import (
        DEFAULT_BLOCK_K,
        DEFAULT_BLOCK_Q,
        MAX_LOCAL_SEQ_HBM,
        fits_hbm_ring,
    )

    step = math.lcm(DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    out = {
        "assumptions": {
            "n_dev": n_dev,
            "ici_bytes_per_s": ici_bytes_per_s,
            "flash_flops_per_s": flash_flops_per_s,
            "flash_int8_flops_per_s": flash_int8_flops_per_s,
            "matmul_flops_per_s": matmul_flops_per_s,
        },
        # largest view count the HBM-staged ring kernel covers on this mesh
        "hbm_ring_max_views": (MAX_LOCAL_SEQ_HBM // step * step)
        * n_dev
        // tokens_per_frame,
        "per_layer": {},
    }
    HD = num_heads * head_dim
    for S in views:
        N = S * tokens_per_frame
        nl = -(-N // n_dev)
        kv_bytes = 2 * N * HD * bytes_per_elem
        t_allgather = kv_bytes * (n_dev - 1) / n_dev / ici_bytes_per_s
        t_attn = 4 * nl * N * HD / flash_flops_per_s
        t_dense = 24 * nl * embed_dim * embed_dim / matmul_flops_per_s
        ring_step_comm = 2 * nl * HD * bytes_per_elem / ici_bytes_per_s
        ring_step_attn = 4 * nl * nl * HD / flash_flops_per_s
        out["per_layer"][S] = {
            "tokens_per_device": nl,
            "allgather_ms": round(t_allgather * 1e3, 3),
            "attn_ms": round(t_attn * 1e3, 3),
            "attn_int8_ms": round(
                4 * nl * N * HD / flash_int8_flops_per_s * 1e3, 3
            ),
            "dense_ms": round(t_dense * 1e3, 3),
            "allgather_comm_fraction": round(t_allgather / (t_attn + t_dense), 3),
            "ring_step_comm_ms": round(ring_step_comm * 1e3, 3),
            "ring_step_attn_ms": round(ring_step_attn * 1e3, 3),
            "ring_comm_hidden": ring_step_comm <= ring_step_attn,
            # int8 serving mode: KV rotates as int8 (half the bytes) while
            # the per-step attention runs at the int8 kernel rate — the
            # hiding question must compare int8 comm against int8 compute
            "ring_step_comm_int8_ms": round(ring_step_comm / 2 * 1e3, 3),
            "ring_comm_hidden_int8": (
                ring_step_comm / 2
                <= 4 * nl * nl * HD / flash_int8_flops_per_s
            ),
            "hbm_ring_ok": fits_hbm_ring(nl),
        }
    return out
