"""Axial 2D rotary position embeddings, precomputed as static tables.

The reference (/root/reference/omnivggt/layers/rope.py:24-188) computes per-call
frequency caches keyed on device/dtype and gathers them with an embedding
lookup. On TPU the position grid is static at trace time (it depends only on the
patch grid and the number of special tokens), so we bake the cos/sin tables as
constants of shape (N, head_dim) — no gather, no cache, and the apply fuses into
the attention prologue.

Feature-dim convention (rope.py:174-188): the head dim D is split in half; the
first D/2 features rotate with the y coordinate, the last D/2 with x. Within
each half, rotate-half splits at D/4. Frequency base defaults to 100
(models/aggregator.py:69).

Special tokens (camera + registers) get position 0 and patch positions are
shifted by +1 (models/aggregator.py:247-250), so index 0 is the identity
rotation for them.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax.numpy as jnp


def make_positions(grid_h: int, grid_w: int, patch_start_idx: int = 0) -> np.ndarray:
    """(patch_start_idx + grid_h*grid_w, 2) int32 (y, x) positions: zeros for the
    special tokens, then the row-major patch grid shifted by +1."""
    y = np.arange(grid_h, dtype=np.int32)
    x = np.arange(grid_w, dtype=np.int32)
    yy, xx = np.meshgrid(y, x, indexing="ij")
    pos = np.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1) + (1 if patch_start_idx else 0)
    if patch_start_idx:
        pos = np.concatenate([np.zeros((patch_start_idx, 2), np.int32), pos], axis=0)
    return pos


@lru_cache(maxsize=32)
def _tables_np(
    grid_h: int, grid_w: int, patch_start_idx: int, head_dim: int, frequency: float
) -> Tuple[np.ndarray, np.ndarray]:
    positions = make_positions(grid_h, grid_w, patch_start_idx)  # (N, 2)
    d_axis = head_dim // 2
    exponents = np.arange(0, d_axis, 2, dtype=np.float64) / d_axis
    inv_freq = 1.0 / (frequency**exponents)  # (d_axis/2,)

    cos_parts, sin_parts = [], []
    for axis in (0, 1):  # y then x
        angles = positions[:, axis].astype(np.float64)[:, None] * inv_freq[None, :]
        angles = np.concatenate([angles, angles], axis=-1)  # (N, d_axis)
        cos_parts.append(np.cos(angles))
        sin_parts.append(np.sin(angles))
    cos = np.concatenate(cos_parts, axis=-1).astype(np.float32)  # (N, head_dim)
    sin = np.concatenate(sin_parts, axis=-1).astype(np.float32)
    return cos, sin


def rope_tables(
    grid_h: int,
    grid_w: int,
    patch_start_idx: int,
    head_dim: int,
    frequency: float = 100.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static (N, head_dim) cos/sin tables for one frame's token sequence."""
    cos, sin = _tables_np(grid_h, grid_w, patch_start_idx, head_dim, float(frequency))
    return jnp.asarray(cos), jnp.asarray(sin)


def _rotate_half_per_axis(x: jnp.ndarray) -> jnp.ndarray:
    """Apply rotate-half independently to the y-half and x-half of the last dim."""
    d = x.shape[-1]
    q = d // 4
    y1, y2 = x[..., :q], x[..., q : 2 * q]
    x1, x2 = x[..., 2 * q : 3 * q], x[..., 3 * q :]
    return jnp.concatenate([-y2, y1, -x2, x1], axis=-1)


@lru_cache(maxsize=8)
def _rotate_matrix_np(d: int) -> np.ndarray:
    """(D, D) signed-permutation matrix P with x @ P == rotate-half(x)."""
    q = d // 4
    P = np.zeros((d, d), np.float32)
    for axis_off in (0, 2 * q):  # y half, x half
        for i in range(q):
            P[axis_off + q + i, axis_off + i] = -1.0  # -x2 -> first quarter
            P[axis_off + i, axis_off + q + i] = 1.0  # x1 -> second quarter
    return P


def apply_rope(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    prefer_matmul: bool = None,
) -> jnp.ndarray:
    """Apply axial 2D RoPE.

    For bf16 inputs the rotate-half runs as a matmul with a signed
    permutation matrix: each output row sums exactly one +-x term, so the
    result is bit-exact while the MXU does the lane shuffle — on TPU the
    slice/concatenate form lowers to VPU lane permutes of a 16-lane-granular
    D=64 vector, which XLA neither fuses nor vectorises well (measured ~37 ms
    of a 522 ms S=8 forward; the matmul form recovered ~27 of them). Other
    dtypes (fp32 CPU parity tests) keep the concatenate form: a
    default-precision fp32 matmul would round through bf16 on the MXU.

    prefer_matmul: callers that know their consumer can override — the
    matmul form wins when q/k feed an opaque Pallas kernel, while the
    concatenate form fuses into XLA's own attention (ops/layers.attention
    passes resolve_impl's verdict). None = matmul for bf16.

    Args:
        x: (B, N, H, D) queries or keys.
        cos, sin: (N, D) tables from rope_tables (tiled if the sequence spans
            multiple frames).
    """
    cos = cos.astype(x.dtype)[None, :, None, :]
    sin = sin.astype(x.dtype)[None, :, None, :]
    if x.dtype == jnp.bfloat16 and prefer_matmul is not False:
        P = jnp.asarray(_rotate_matrix_np(x.shape[-1]), x.dtype)
        return x * cos + (x @ P) * sin
    return x * cos + _rotate_half_per_axis(x) * sin


def tile_tables(cos: jnp.ndarray, sin: jnp.ndarray, repeats: int):
    """Tile per-frame tables along the sequence for S-frame global attention."""
    return jnp.tile(cos, (repeats, 1)), jnp.tile(sin, (repeats, 1))
