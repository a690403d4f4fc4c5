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
