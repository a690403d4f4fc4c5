"""Separable image resizing with exact torch.nn.functional.interpolate semantics.

jax.image.resize only implements half-pixel sampling, but the reference heads
depend on torch's variants:
  - bilinear, align_corners=True  (DPT fusion pyramid + final upsample,
    /root/reference/omnivggt/heads/dpt_head.py:242-247,466)
  - bicubic, align_corners=False, antialias=True  (DINOv2 pos-embed
    interpolation, /root/reference/omnivggt/layers/vision_transformer.py:204-209)

Implementation: build 1D interpolation weight matrices (out, in) in float64
numpy at trace time (sizes are static under jit) and apply them as two dense
matmuls over H then W. Each row has <= 4 non-zeros (<= kernel support), but on
TPU a small dense matmul on the MXU beats a gather, and the result is
bit-faithful to torch's algorithm (index clamping at borders accumulates
weights exactly like torch's implementation).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def _cubic(x: np.ndarray, A: float = -0.75) -> np.ndarray:
    """torch's cubic convolution kernel (A = -0.75)."""
    x = np.abs(x)
    return np.where(
        x <= 1.0,
        ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * A, 0.0),
    )


def _linear(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


_FILTERS = {"bilinear": (_linear, 1.0), "bicubic": (_cubic, 2.0)}


@lru_cache(maxsize=256)
def _resize_weight_matrix(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool,
    antialias: bool,
) -> np.ndarray:
    """(out_size, in_size) float32 interpolation matrix matching
    torch.nn.functional.interpolate along one axis."""
    filt, support = _FILTERS[mode]
    W = np.zeros((out_size, in_size), dtype=np.float64)

    if align_corners:
        coords = (
            np.arange(out_size) * (in_size - 1) / (out_size - 1)
            if out_size > 1
            else np.zeros(out_size)
        )
    else:
        scale = in_size / out_size
        coords = (np.arange(out_size) + 0.5) * scale - 0.5

    scale = in_size / out_size
    if antialias:
        # PIL-style separable resampling (torch antialias=True): bicubic kernel
        # uses A=-0.5 here (PIL's), support scaled by the downscale factor,
        # weights normalised; applies to upscaling too (invscale = 1).
        assert not align_corners, "torch antialias path assumes align_corners=False"
        aa_filt = (lambda x: _cubic(x, A=-0.5)) if mode == "bicubic" else _linear
        fscale = max(scale, 1.0)
        invscale = 1.0 / fscale
        sup = support * fscale
        centers = (np.arange(out_size) + 0.5) * scale
        for i in range(out_size):
            xmin = max(0, int(centers[i] - sup + 0.5))
            xmax = min(in_size, int(centers[i] + sup + 0.5))
            x = np.arange(xmin, xmax)
            w = aa_filt((x - centers[i] + 0.5) * invscale)
            s = w.sum()
            if s > 0:
                W[i, xmin:xmax] = w / s
    else:
        taps = int(support) * 2  # 2 for bilinear, 4 for bicubic
        for i in range(out_size):
            base = int(np.floor(coords[i]))
            frac = coords[i] - base
            if mode == "bilinear":
                idxs = [base, base + 1]
                ws = [1.0 - frac, frac]
            else:
                idxs = [base - 1, base, base + 1, base + 2]
                ws = [
                    _cubic(1.0 + frac),
                    _cubic(frac),
                    _cubic(1.0 - frac),
                    _cubic(2.0 - frac),
                ]
            for idx, w in zip(idxs, ws):
                W[i, int(np.clip(idx, 0, in_size - 1))] += float(w)

    return W.astype(np.float32)


def interpolate(
    x: jnp.ndarray,
    size,
    mode: str = "bilinear",
    align_corners: bool = True,
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize (..., H, W, C) channels-last images to `size` = (H_out, W_out)
    with torch.nn.functional.interpolate semantics."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = size
    if (Ho, Wo) == (H, W):
        return x
    wy = jnp.asarray(_resize_weight_matrix(H, Ho, mode, align_corners, antialias))
    wx = jnp.asarray(_resize_weight_matrix(W, Wo, mode, align_corners, antialias))
    # resize in fp32 for accuracy, cast back at the end
    dtype = x.dtype
    y = jnp.einsum("oh,...hwc->...owc", wy, x.astype(jnp.float32))
    y = jnp.einsum("ow,...hwc->...hoc", wx, y)
    return y.astype(dtype)
