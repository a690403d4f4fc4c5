"""DPT dense-prediction head (depth / point maps + confidence).

Mirrors /root/reference/omnivggt/heads/dpt_head.py:21-497: per-level
LayerNorm -> 1x1 projection -> sinusoidal UV pos-embed (x0.1) -> resize
(4x / 2x transposed conv, identity, stride-2 conv) -> RefineNet-style fusion
pyramid -> bilinear align_corners=True upsample to full resolution -> output
convs -> activation split into values + confidence
(/root/reference/omnivggt/heads/head_act.py:61-125).

TPU-first details:
  - everything runs NHWC with HWIO kernels; the k==stride transposed convs are
    expressed as a matmul + pixel-shuffle reshape (exact, MXU-friendly).
  - frames are processed in chunks of `frames_chunk_size` via lax.map to bound
    the full-resolution activation memory (the reference chunks by 8,
    dpt_head.py:152-183).
  - always fp32 (reference heads run under autocast(enabled=False)).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from omnivggt_tpu.config import DPTHeadConfig
from omnivggt_tpu.ops import layers as L
from omnivggt_tpu.ops.activations import activate_head
from omnivggt_tpu.ops.resize import interpolate

# Space-to-depth rewrite of the cout<128 output convs: folds 2x2 output
# pixels into channels so the MXU lanes fill (see L.conv2d_s2d). Exact to
# the fused conv up to reduction order. Measured NEGATIVE e2e (-3.7%);
# kept as a probe, OMNIVGGT_S2D_HEAD_CONVS=1 opts in.
_S2D_HEAD_CONVS = os.environ.get("OMNIVGGT_S2D_HEAD_CONVS", "0") != "0"

# Pallas W-folded conv kernel (ops/pallas/conv3x3.py). On the flagship
# (features=256) the only fold-eligible conv is output_conv2.conv1
# (128->32 at 518px; output_conv1 is 256->128, f=1). Measured NEGATIVE
# e2e (-10.3% S=8, paired BENCH_ITERS=60): the kernel beats the XLA conv
# 2.2x but the XLA-side tap expansion re-materialises the 549 MB conv
# input in uncoalesced strided slices — see the kernel docstring for the
# full trace-backed account. Probe only; OMNIVGGT_PALLAS_HEAD_CONVS=1
# opts in. bf16/fp32 serving only (no VJP; int8 head_quant keeps the XLA
# conv).
_PALLAS_HEAD_CONVS = os.environ.get("OMNIVGGT_PALLAS_HEAD_CONVS", "0") != "0"


def _conv3x3(p, x, int8=False, relu=False):
    """3x3 pad-1 conv (+ optional following ReLU, fused into the Pallas
    kernel when that path is taken), routed through the space-to-depth
    rewrite or the Pallas folded kernel when enabled and eligible."""
    if _PALLAS_HEAD_CONVS and not int8 and jax.default_backend() == "tpu":
        from omnivggt_tpu.ops.pallas.conv3x3 import (
            conv3x3_eligible,
            conv3x3_folded,
        )

        if conv3x3_eligible(x.shape, p["w"].shape):
            return conv3x3_folded(p, x, relu=relu)
    if _S2D_HEAD_CONVS and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0:
        y = L.conv2d_s2d(p, x, int8=int8)
    else:
        y = L.conv2d(p, x, padding=((1, 1), (1, 1)), int8=int8)
    return jax.nn.relu(y) if relu else y


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init(key, cfg: DPTHeadConfig):
    ks = iter(jax.random.split(key, 32))
    f = cfg.features
    oc = cfg.out_channels

    def rcu(k):
        k1, k2 = jax.random.split(k)
        return {"conv1": L.conv_init(k1, 3, 3, f, f), "conv2": L.conv_init(k2, 3, 3, f, f)}

    def fusion(k, has_residual=True):
        k1, k2, k3 = jax.random.split(k, 3)
        p = {"out_conv": L.conv_init(k1, 1, 1, f, f), "rcu2": rcu(k2)}
        if has_residual:
            p["rcu1"] = rcu(k3)
        return p

    params = {
        "norm": L.layer_norm_init(cfg.dim_in),
        "projects": [L.conv_init(next(ks), 1, 1, cfg.dim_in, c) for c in oc],
        "resize": [
            # ConvTranspose2d(oc0, oc0, k=4, s=4) / (oc1, oc1, k=2, s=2):
            # stored as torch-layout (in, out, kh, kw) -> flattened matmul
            {"w": _deconv_init(next(ks), oc[0], oc[0], 4), "b": jnp.zeros((oc[0],))},
            {"w": _deconv_init(next(ks), oc[1], oc[1], 2), "b": jnp.zeros((oc[1],))},
            None,
            L.conv_init(next(ks), 3, 3, oc[3], oc[3]),
        ],
        "layer_rn": [
            {"w": L.conv_init(next(ks), 3, 3, c, f)["w"]} for c in oc  # bias=False
        ],
        "refinenet1": fusion(next(ks)),
        "refinenet2": fusion(next(ks)),
        "refinenet3": fusion(next(ks)),
        "refinenet4": fusion(next(ks), has_residual=False),
        "output_conv1": L.conv_init(
            next(ks), 3, 3, f, f if cfg.feature_only else f // 2
        ),
    }
    if not cfg.feature_only:
        params["output_conv2"] = {
            "conv1": L.conv_init(next(ks), 3, 3, f // 2, 32),
            "conv2": L.conv_init(next(ks), 1, 1, 32, cfg.output_dim),
        }
    return params


def _deconv_init(key, in_c, out_c, k):
    """torch ConvTranspose2d default init, stored (in, out, kh, kw)."""
    import math

    bound = 1.0 / math.sqrt(out_c * k * k)  # torch fan_in for ConvT = out*k*k
    return jax.random.uniform(key, (in_c, out_c, k, k), jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _deconv_same_ks(p, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """ConvTranspose2d with kernel == stride == k, padding 0: each input pixel
    expands into a k x k output tile — a matmul + pixel shuffle."""
    B, H, W, Cin = x.shape
    w = p["w"].astype(x.dtype)  # (in, out, k, k)
    Cout = w.shape[1]
    wmat = w.transpose(0, 2, 3, 1).reshape(Cin, k * k * Cout)
    y = x @ wmat  # (B, H, W, k*k*Cout)
    y = y.reshape(B, H, W, k, k, Cout).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(B, H * k, W * k, Cout)
    return y + p["b"].astype(x.dtype)


def _rcu(p, x, int8=False):
    # NOTE: the reference's ResidualConvUnit uses nn.ReLU(inplace=True)
    # (dpt_head.py:315,389), which mutates its input — so the skip connection
    # effectively adds relu(x), not x. We reproduce that exact semantics.
    xr = jax.nn.relu(x)
    out = L.conv2d(p["conv1"], xr, padding=((1, 1), (1, 1)), int8=int8)
    out = jax.nn.relu(out)
    out = L.conv2d(p["conv2"], out, padding=((1, 1), (1, 1)), int8=int8)
    return out + xr


def _fusion(p, x, residual=None, size=None, int8=False):
    """FeatureFusionBlock (dpt_head.py:402-469): optional residual RCU add,
    RCU, bilinear align-corners resize, 1x1 out conv."""
    if residual is not None:
        x = x + _rcu(p["rcu1"], residual, int8=int8)
    x = _rcu(p["rcu2"], x, int8=int8)
    if size is None:
        size = (x.shape[-3] * 2, x.shape[-2] * 2)
    x = interpolate(x, size, mode="bilinear", align_corners=True)
    return L.conv2d(p["out_conv"], x, padding="VALID")


@lru_cache(maxsize=64)
def _uv_pos_embed_np(width: int, height: int, dim: int, aspect_ratio: float, omega_0: float = 100.0):
    """Sinusoidal embedding of the diagonal-normalised UV grid
    (heads/utils.py:11-108), precomputed in numpy (static under jit)."""
    diag = (aspect_ratio**2 + 1.0) ** 0.5
    span_x, span_y = aspect_ratio / diag, 1.0 / diag
    xs = np.linspace(-span_x * (width - 1) / width, span_x * (width - 1) / width, width)
    ys = np.linspace(-span_y * (height - 1) / height, span_y * (height - 1) / height, height)
    uu, vv = np.meshgrid(xs, ys)  # (height, width)
    half = dim // 2
    omega = np.arange(half // 2, dtype=np.float64) / (half / 2.0)
    omega = 1.0 / omega_0**omega

    def sincos(pos):
        out = pos.reshape(-1)[:, None] * omega[None, :]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate([sincos(uu), sincos(vv)], axis=-1).astype(np.float32)
    return emb.reshape(height, width, dim)


def _apply_pos_embed(x: jnp.ndarray, img_w: int, img_h: int, ratio: float = 0.1):
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    pe = jnp.asarray(_uv_pos_embed_np(w, h, c, img_w / img_h)) * ratio
    return x + pe.astype(x.dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _chunking(K: int, frames_chunk_size) -> tuple:
    """Split K frames into ceil(K/chunk) groups of `chunk` (last group padded).

    Returns (chunk, pad, n_chunks). The reference chunks by 8
    (dpt_head.py:152-183) with a ragged final chunk; under jit shapes must be
    static, so the final chunk is padded instead — e.g. K=13, chunk=8 runs 2
    map steps, not 13 steps of 1.
    """
    chunk = min(frames_chunk_size or K, K)
    n_chunks = -(-K // chunk)
    return chunk, n_chunks * chunk - K, n_chunks


def _forward_frames(params, tokens4, cfg: DPTHeadConfig, patch_hw, img_hw):
    """Process one chunk of frames.

    Args:
        tokens4: (4, K, n_patch, dim_in) patch tokens of the 4 DPT levels,
            K = frames in this chunk.
    Returns:
        (K, H, W, output_dim) raw head output (pre-activation), or features if
        cfg.feature_only.
    """
    ph, pw = patch_hw
    H, W = img_hw
    out_levels = []
    for lvl in range(4):
        # compute dtype follows the caller's cast (fp32 by default)
        x = tokens4[lvl]
        x = L.layer_norm(params["norm"], x, cfg.ln_eps)
        x = x.reshape(x.shape[0], ph, pw, cfg.dim_in)
        x = L.conv2d(params["projects"][lvl], x, padding="VALID")
        if cfg.pos_embed:
            x = _apply_pos_embed(x, W, H)
        if lvl == 0:
            x = _deconv_same_ks(params["resize"][0], x, 4)
        elif lvl == 1:
            x = _deconv_same_ks(params["resize"][1], x, 2)
        elif lvl == 3:
            x = L.conv2d(params["resize"][3], x, stride=(2, 2), padding=((1, 1), (1, 1)))
        out_levels.append(x)

    # W8A8 for the heavy 3x3 convs (serving-only, cfg.quant via
    # OmniVGGTConfig.head_quant); the projects/resize/out_conv 1x1s and the
    # final regression conv stay full-precision
    q8 = cfg.quant == "int8"
    l1, l2, l3, l4 = [
        L.conv2d(params["layer_rn"][i], out_levels[i],
                 padding=((1, 1), (1, 1)), int8=q8)
        for i in range(4)
    ]

    out = _fusion(params["refinenet4"], l4, size=l3.shape[-3:-1], int8=q8)
    out = _fusion(params["refinenet3"], out, l3, size=l2.shape[-3:-1], int8=q8)
    out = _fusion(params["refinenet2"], out, l2, size=l1.shape[-3:-1], int8=q8)
    out = _fusion(params["refinenet1"], out, l1, int8=q8)
    out = _conv3x3(params["output_conv1"], out, int8=q8)

    target = (
        int(ph * cfg.patch_size / cfg.down_ratio),
        int(pw * cfg.patch_size / cfg.down_ratio),
    )
    out = interpolate(out, target, mode="bilinear", align_corners=True)
    if cfg.pos_embed:
        out = _apply_pos_embed(out, W, H)
    if cfg.feature_only:
        return out
    out = _conv3x3(params["output_conv2"]["conv1"], out, int8=q8, relu=True)
    out = L.conv2d(params["output_conv2"]["conv2"], out, padding="VALID")
    return out


def apply(params, aggregated_tokens, cfg: DPTHeadConfig, images_hw, patch_start_idx: int,
          layer_slots, dtype=jnp.float32):
    """Run the DPT head.

    Args:
        aggregated_tokens: (L, B, S, P, dim_in) materialised aggregator
            layers, in any dtype — typically the bf16 trunk buffer; each
            frame chunk is upcast to `dtype` right before its compute, so
            the full-buffer fp32 copy (multi-GB at large S) never
            materialises while the head math stays fp32.
        layer_slots: indices into L for the 4 levels this head consumes
            (mapping of cfg.intermediate_layer_idx into the buffer).
        images_hw: (H, W) of the input images.
        dtype: head compute dtype (the reference runs heads fp32,
            omnivggt.py:45).

    Returns:
        (preds, conf): (B, S, H, W, output_dim - 1) and (B, S, H, W), or
        features (B, S, H', W', features) if cfg.feature_only.
    """
    H, W = images_hw
    ph, pw = H // cfg.patch_size, W // cfg.patch_size
    _, B, S, P, _ = aggregated_tokens.shape

    # (4, B*S, n_patch, dim_in)
    toks = jnp.stack(
        [aggregated_tokens[s][:, :, patch_start_idx:] for s in layer_slots]
    ).reshape(4, B * S, ph * pw, cfg.dim_in)

    K = B * S
    chunk, pad, n_chunks = _chunking(K, cfg.frames_chunk_size)

    def run_chunk(t4):
        return _forward_frames(params, t4.astype(dtype), cfg, (ph, pw), (H, W))

    if n_chunks == 1:
        out = run_chunk(toks)
    else:
        # pad the frame axis up to a chunk multiple (shapes stay static; the
        # padded frames are dead work sliced off below) instead of degrading
        # to tiny divisor chunks on awkward frame counts
        if pad:
            toks = jnp.pad(toks, ((0, 0), (0, pad), (0, 0), (0, 0)))
        toks_c = toks.reshape(4, n_chunks, chunk, ph * pw, cfg.dim_in).transpose(1, 0, 2, 3, 4)
        out = jax.lax.map(run_chunk, toks_c)
        out = out.reshape(n_chunks * chunk, *out.shape[2:])[:K]

    if cfg.feature_only:
        return out.reshape(B, S, *out.shape[1:])

    preds, conf = activate_head(
        out.astype(jnp.float32),
        activation=cfg.activation, conf_activation=cfg.conf_activation,
    )
    return (
        preds.reshape(B, S, *preds.shape[1:]),
        conf.reshape(B, S, *conf.shape[1:]),
    )
