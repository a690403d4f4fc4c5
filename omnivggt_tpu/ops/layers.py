"""Functional transformer layers with explicit pytree parameters.

Design: pure functions over param dicts (no module state). Linear weights are
stored [in, out] (JAX convention, the transpose of torch), convs are HWIO.
Semantics track the reference layer zoo:
  - Mlp: /root/reference/omnivggt/layers/mlp.py:16-40 (GELU is the exact erf form)
  - LayerScale: /root/reference/omnivggt/layers/layer_scale.py:15-27
  - Attention (fused QKV, optional per-head-dim q/k LayerNorm, RoPE on q and k):
    /root/reference/omnivggt/layers/attention.py:21-77
  - Block (pre-LN, LS residuals): /root/reference/omnivggt/layers/block.py:27-107
  - PatchEmbed (convolutional patchify): /root/reference/omnivggt/layers/patch_embed.py:25-88
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from omnivggt_tpu.ops.attention import scaled_dot_product_attention
from omnivggt_tpu.ops.rope import apply_rope

# Epilogue barrier (r4, VERDICT item 2): optimization_barrier between each
# block matmul and its residual add, keeping the residual add + the NEXT
# LayerNorm's mean/var reductions out of the matmul's kOutput epilogue
# (profiled at ~91 TF/s vs fc1's 174 when fused). Long paired runs on the
# chip (BENCH_ITERS=60, S=8 @518px): 20.14 / 20.15 without vs 20.48 / 20.49
# with — a reproducible +1.7%; exactly neutral at S=64 (6.6462 vs 6.6464,
# attention-dominated). The isolated LN->MLP->residual scan measures the
# OPPOSITE sign (tools/bench_fc2_fusion.py: 30.67 -> 31.27 ms with the
# barrier) — the win only exists in the full model where the epilogue also
# drags LayerScale + the slot-buffer write into the matmul — so don't trust
# the microbench here. Default ON; OMNIVGGT_EPILOGUE_BARRIER=0 opts out.
# Exact identity (and identity under AD), so parity is unaffected.
_EPILOGUE_BARRIER = os.environ.get("OMNIVGGT_EPILOGUE_BARRIER", "1") != "0"

# Barrier between the qkv matmul and the Pallas-kernel head split/transpose
# (see attention() below): without it XLA fuses the transposed (B,N,3,H,D)
# head-split write into the qkv matmul epilogue, halving its rate (profiled
# r4: 0.72 ms/layer at ~96 TF/s vs the natural-layout frame qkv's 0.38 at
# ~180). The barrier buys a peak-rate matmul + an explicit bandwidth-bound
# relayout: paired A/B/B/A on the chip (S=8 @518px, BENCH_ITERS=60) measured
# 20.454/20.463 off vs 20.593/20.592 on — a reproducible +0.67%. Default ON
# for Pallas-consumer call sites only (XLA attention fuses the split into
# its own prologue better); OMNIVGGT_QKV_BARRIER=0 opts out. Exact identity.
_QKV_BARRIER = os.environ.get("OMNIVGGT_QKV_BARRIER", "1") != "0"

# int8-qk pays a per-token cost (per-head quant passes, f32->s8 conversions,
# scale reductions) to halve the score-matmul time, which is quadratic in N —
# so it has a break-even sequence length. Experimental dispatch floor for the
# UNSHARDED path (the sharded strategies keep int8 regardless: their KV
# quantisation also halves ICI bytes): 0 = int8 everywhere (current
# behavior), N below the floor runs the bf16 flash kernel.
_INT8_QK_MIN_SEQ = int(os.environ.get("OMNIVGGT_INT8_QK_MIN_SEQ", "0"))


# ---------------------------------------------------------------------------
# Initialisers (match torch defaults closely enough for random-weight tests)
# ---------------------------------------------------------------------------


def linear_init(key, in_features: int, out_features: int, bias: bool = True):
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    p = {"w": jax.random.uniform(kw, (in_features, out_features), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_features,), jnp.float32, -bound, bound)
    return p


def layer_norm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def conv_init(key, kh: int, kw: int, in_chans: int, out_chans: int, bias: bool = True):
    """torch nn.Conv2d default init; weight stored HWIO."""
    k1, k2 = jax.random.split(key)
    fan_in = in_chans * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(k1, (kh, kw, in_chans, out_chans), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (out_chans,), jnp.float32, -bound, bound)
    return p


# ---------------------------------------------------------------------------
# Primitive applies
# ---------------------------------------------------------------------------


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def qlinear_int8(p, x: jnp.ndarray) -> jnp.ndarray:
    """W8A8 dense: per-(out-)channel weight quant, dynamic per-row activation
    quant, int8xint8->int32 on the MXU, dequant + bias in the epilogue.

    The v5e MXU runs int8 at 2x the bf16 rate (measured 340 TOPS vs 183
    TFLOPs through this host's tunnel; 1.3x end-to-end on the trunk MLP
    shapes once the quant/dequant VPU passes are paid). Weights are
    quantised at trace time from the fp32/bf16 params — a 1/N-of-the-matmul
    cost — so no checkpoint transform or separate int8 param tree exists;
    `config.trunk_quant` alone decides the path and the certification
    ladder (models/omnivggt.certify_fast_modes) gates it on real weights.
    """
    w = p["w"]
    ws = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    ws = jnp.maximum(ws, 1e-12) / 127.0  # (1, out)
    wq = jnp.round(w.astype(jnp.float32) / ws).astype(jnp.int8)

    ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    ax = jnp.maximum(ax, 1e-12) / 127.0  # (..., 1)
    xq = jnp.round(x.astype(jnp.float32) / ax).astype(jnp.int8)

    y = jax.lax.dot_general(
        xq, wq,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * ax * ws
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def dense(p, x: jnp.ndarray, int8: bool = False) -> jnp.ndarray:
    """linear() or qlinear_int8() on one flag (the trunk-quant dispatch)."""
    return qlinear_int8(p, x) if int8 else linear(p, x)


def _quant_gates(trunk_quant):
    """(quantize_ln_fed, quantize_residual_writers) for a trunk_quant mode.

    "int8" quantises all four block matmuls; "int8_ln" only qkv and fc1 —
    their inputs are LayerNorm outputs (bounded, well-conditioned for 8-bit
    grids) and their outputs pass through qk-norm / GELU rather than writing
    the residual stream directly, so the quantisation noise that reaches the
    stream is second-order. Half the speedup of full int8, a fraction of the
    error."""
    if trunk_quant in (True, "int8"):
        return True, True
    if trunk_quant == "int8_ln":
        return True, False
    return False, False


def layer_norm(p, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis; statistics in fp32 regardless of x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def mlp(p, x: jnp.ndarray, approx_gelu: bool = False, int8_dense=False) -> jnp.ndarray:
    """fc1 -> GELU -> fc2, or SwiGLU when the params carry w12/w3
    (reference swiglu_ffn.py:14-34: silu(x1) * x2 through a fused w12).

    approx_gelu: tanh-form GELU instead of the reference's exact erf
    (mlp.py:16-40 uses nn.GELU's default exact form). The tanh form's error
    (<= ~3e-4 absolute) sits below bf16 rounding of the trunk activations,
    while erf's high-degree polynomial costs real VPU time over the 4x-wide
    hidden (measured +10% whole-model throughput at S=8). Off by default
    (bit parity); checkpoint loading certifies it on via a probe batch
    (models/omnivggt.certify_fast_modes)."""
    q_ln, q_res = _quant_gates(int8_dense)
    if "w12" in p:
        x12 = dense(p["w12"], x, q_ln)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return dense(p["w3"], jax.nn.silu(x1) * x2, q_res)
    h = dense(p["fc1"], x, q_ln)
    h = jax.nn.gelu(h, approximate=approx_gelu)
    return dense(p["fc2"], h, q_res)


def swiglu_hidden_fused(hidden_features: int) -> int:
    """SwiGLUFFNFused hidden rounding (swiglu_ffn.py:66): 2/3 of the GELU
    hidden size rounded up to a multiple of 8."""
    return (int(hidden_features * 2 / 3) + 7) // 8 * 8


def drop_path(key, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Stochastic depth (reference layers/drop_path.py:14-24): per-sample
    Bernoulli keep mask on the leading axis, scaled by 1/keep_prob. The
    reference's >0.1-rate subset optimisation (block.py:159-186) is a
    GPU-side compute trick with dynamic shapes; under jit the static mask
    form (same estimator) is the TPU-native choice."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * (mask.astype(x.dtype) / keep)


def conv2d(
    p, x: jnp.ndarray, stride=(1, 1), padding="SAME", int8: bool = False
) -> jnp.ndarray:
    """NHWC conv with HWIO weights. int8=True runs W8A8 (qconv2d_int8)."""
    if int8:
        return qconv2d_int8(p, x, stride=stride, padding=padding)
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def qconv2d_int8(p, x: jnp.ndarray, stride=(1, 1), padding="SAME") -> jnp.ndarray:
    """W8A8 NHWC conv: per-out-channel weight quant (trace-time, like
    qlinear_int8), dynamic per-image activation quant, s8xs8->s32
    convolution, dequant + bias in the epilogue.

    config.head_quant routes the DPT-head convs here (serving-only,
    certified per-checkpoint); whether the int8 conv actually beats bf16 on
    this chip is measured by tools/bench_int8_conv.py — the mode stays out
    of the automatic certification ladder until the measurement says yes."""
    w = p["w"]
    ws = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    ws = jnp.maximum(ws, 1e-12) / 127.0  # (out,)
    wq = jnp.round(w.astype(jnp.float32) / ws).astype(jnp.int8)

    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=True)
    ax = jnp.maximum(ax, 1e-12) / 127.0  # (B, 1, 1, 1)
    xq = jnp.round(x.astype(jnp.float32) / ax).astype(jnp.int8)

    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * ax * ws
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv2d_s2d(p, x: jnp.ndarray, int8: bool = False) -> jnp.ndarray:
    """3x3 stride-1 pad-1 conv with 2x2 output pixels folded into channels.

    Exact rewrite for MXU lane occupancy: a cout<128 conv (the DPT output
    convs, /root/reference/omnivggt/heads/dpt_head.py:101-126: 128->64 at
    296px and 64->32 at 518px) fills only cout/128 of the MXU lanes, so its
    roofline is ~cout/128 of peak (profiled r4: ~35 of ~44 TF/s achievable
    at cout=32). Emitting each 2x2 tile of output pixels as channels of one
    half-resolution position turns the conv into a single STRIDE-2 4x4 conv
    with 4*cout output channels — the input is read directly (no
    space-to-depth relayout; an earlier 2x2-conv-over-s2d-blocks variant
    paid pad + double-transpose passes on the full-res input and measured
    -3.7% end-to-end), 16/9 the dense FLOPs (the extra kernel taps are
    exact zeros) at ~4x the lane occupancy, plus one output depth-to-space
    pass. Result is numerically the 3x3 conv (the zero-weight taps
    contribute exact zeros to the same-accumulation-dtype sum).

    Requires a 3x3 kernel and even H, W.
    """
    w = p["w"]
    kh, kw, cin, cout = w.shape
    B, H, W, _ = x.shape
    if kh != 3 or kw != 3 or H % 2 or W % 2:
        raise ValueError(f"conv2d_s2d needs 3x3 kernel and even H,W; got {w.shape}, {x.shape}")

    # Equivalent single stride-2 4x4 conv producing all 4 output sub-pixels
    # as channels — the input is read DIRECTLY (no space-to-depth relayout
    # of x; the conv window covers both 2x2 phases):
    #   W'[ty,tx, ci, (dy,dx,co)] = W[ty-dy, tx-dx, ci, co]   (zero o.o.r.)
    idx = np.arange(4)[:, None] - np.arange(2)[None, :] + 1  # (tap, d) -> 5-tap axis
    wpad = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    ky = idx[:, None, :, None]  # axes (ty, tx, dy, dx)
    kx = idx[None, :, None, :]
    w4 = wpad[ky, kx]  # (ty,tx,dy,dx,cin,cout)
    w4 = w4.transpose(0, 1, 4, 2, 3, 5).reshape(4, 4, cin, 4 * cout)

    y = conv2d(
        {"w": w4}, x, stride=(2, 2), padding=((1, 1), (1, 1)), int8=int8
    )  # (B, H/2, W/2, 4*cout)
    y = y.reshape(B, H // 2, W // 2, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(B, H, W, cout)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Attention + Block
# ---------------------------------------------------------------------------


def attention_init(key, dim: int, *, qkv_bias=True, proj_bias=True, qk_norm=False, num_heads: int):
    ks = jax.random.split(key, 2)
    head_dim = dim // num_heads
    p = {
        "qkv": linear_init(ks[0], dim, dim * 3, bias=qkv_bias),
        "proj": linear_init(ks[1], dim, dim, bias=proj_bias),
    }
    if qk_norm:
        p["q_norm"] = layer_norm_init(head_dim)
        p["k_norm"] = layer_norm_init(head_dim)
    return p


def attention(
    p,
    x: jnp.ndarray,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    *,
    num_heads: int,
    ln_eps: float = 1e-5,
    impl: str = "auto",
    shard=None,
    kv_valid=None,
    allow_bounded: bool = True,
    int8_dense=False,
    int8_qk: bool = False,
) -> jnp.ndarray:
    """Multi-head self-attention with fused QKV, optional per-head-dim q/k
    LayerNorm, and 2D RoPE applied to q and k.

    Args:
        x: (B, N, C) tokens.
        rope_cos/rope_sin: (N, head_dim) precomputed axial RoPE tables (or None).
        shard: optional AttnShard (parallel/sharding.py) selecting a
            mesh-parallel attention strategy.
        kv_valid: optional traced int32 scalar masking keys >= kv_valid
            (valid-prefix masking).
        allow_bounded: permit the fixed-max softmax when qk-norm is present.
            Checkpoint loading flips this off if the converted norm weights
            break the logit bound (utils/validation.qk_logit_bound).
        int8_qk: run the flash kernel's score matmul W8A8 on the 2x-rate
            int8 MXU (config.attn_quant, serving-only, certified
            per-checkpoint). Honored only by the unsharded flash impl.
    """
    B, N, C = x.shape
    head_dim = C // num_heads
    q_ln, q_res = _quant_gates(int8_dense)
    qkv = dense(p["qkv"], x, q_ln)

    # resolve the consuming attention impl BEFORE the head split: the Pallas
    # kernels want (B*H, N, D) q/k/v, and without a barrier XLA fuses that
    # transposed write into the qkv matmul's epilogue, halving its rate —
    # see _QKV_BARRIER above for the measurements.
    from omnivggt_tpu.ops.attention import resolve_impl

    qshape = (B, N, num_heads, head_dim)
    if shard is not None:
        mm = shard.resolve_impl(qshape, impl) != "xla"
    else:
        mm = resolve_impl(qshape, impl) != "xla"
    if _QKV_BARRIER and mm:
        qkv = jax.lax.optimization_barrier(qkv)

    qkv = qkv.reshape(B, N, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)

    if "q_norm" in p:
        q = layer_norm(p["q_norm"], q, ln_eps)
        k = layer_norm(p["k_norm"], k, ln_eps)

    if rope_cos is not None:
        # pick the rope form for the attention impl that will consume q/k:
        # matmul rotate-half for the opaque Pallas kernels, concatenate for
        # XLA attention (which fuses it into its own prologue). Sharded
        # strategies resolve on the PER-SHARD shape — allgather/rows can
        # land on XLA attention too (AttnShard.resolve_impl).
        q = apply_rope(q, rope_cos, rope_sin, prefer_matmul=mm)
        k = apply_rope(k, rope_cos, rope_sin, prefer_matmul=mm)

    # qk-norm bounds the scaled scores by sqrt(D)*(max|g_q|+max|b_q|)*
    # (max|g_k|+max|b_k|) — far below exp's fp32 overflow — letting the flash
    # kernel run its softmax at a fixed max (skips a pass per score tile)
    bounded = allow_bounded and "q_norm" in p
    if shard is not None:
        o = shard.attend(
            q, k, v, impl, kv_valid=kv_valid, bounded_logits=bounded,
            qk_int8=int8_qk,
        )
    else:
        o = scaled_dot_product_attention(
            q, k, v, impl=impl, kv_valid=kv_valid, bounded_logits=bounded,
            qk_int8=int8_qk and N >= _INT8_QK_MIN_SEQ,
        )  # (B, N, H, D)
    o = o.reshape(B, N, C)
    return dense(p["proj"], o, q_res)


def block_init(
    key,
    dim: int,
    num_heads: int,
    *,
    mlp_ratio: float = 4.0,
    qkv_bias=True,
    proj_bias=True,
    ffn_bias=True,
    init_values: Optional[float] = None,
    qk_norm=False,
    ffn_layer: str = "mlp",
):
    ks = jax.random.split(key, 3)
    hidden = int(dim * mlp_ratio)
    if ffn_layer in ("swiglu", "swiglufused"):
        if ffn_layer == "swiglufused":
            hidden = swiglu_hidden_fused(hidden)
        ffn = {
            "w12": linear_init(ks[1], dim, 2 * hidden, bias=ffn_bias),
            "w3": linear_init(ks[2], hidden, dim, bias=ffn_bias),
        }
    elif ffn_layer == "mlp":
        ffn = {
            "fc1": linear_init(ks[1], dim, hidden, bias=ffn_bias),
            "fc2": linear_init(ks[2], hidden, dim, bias=ffn_bias),
        }
    else:
        raise NotImplementedError(ffn_layer)
    p = {
        "norm1": layer_norm_init(dim),
        "attn": attention_init(
            ks[0], dim, qkv_bias=qkv_bias, proj_bias=proj_bias, qk_norm=qk_norm, num_heads=num_heads
        ),
        "norm2": layer_norm_init(dim),
        "mlp": ffn,
    }
    if init_values:
        p["ls1"] = {"gamma": jnp.full((dim,), init_values, jnp.float32)}
        p["ls2"] = {"gamma": jnp.full((dim,), init_values, jnp.float32)}
    return p


def block(
    p,
    x: jnp.ndarray,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    *,
    num_heads: int,
    ln_eps: float = 1e-5,
    attn_impl: str = "auto",
    shard=None,
    drop_path_rate: float = 0.0,
    drop_path_key=None,
    kv_valid=None,
    allow_bounded: bool = True,
    approx_gelu: bool = False,
    int8_dense=False,
    int8_qk: bool = False,
) -> jnp.ndarray:
    """Pre-LN transformer block:
       x += DP(LS1(Attn(LN(x), rope))); x += DP(LS2(MLP(LN(x))))
    where DP is stochastic depth, active only when a drop_path_key is given
    (training) and drop_path_rate > 0 (reference block.py:81-107)."""
    use_dp = drop_path_rate > 0.0 and drop_path_key is not None
    if use_dp:
        dp1, dp2 = jax.random.split(drop_path_key)
    h = attention(
        p["attn"],
        layer_norm(p["norm1"], x, ln_eps),
        rope_cos,
        rope_sin,
        num_heads=num_heads,
        ln_eps=ln_eps,
        impl=attn_impl,
        shard=shard,
        kv_valid=kv_valid,
        allow_bounded=allow_bounded,
        int8_dense=int8_dense,
        int8_qk=int8_qk,
    )
    if "ls1" in p:
        h = h * p["ls1"]["gamma"].astype(h.dtype)
    if use_dp:
        h = drop_path(dp1, h, drop_path_rate)
    if _EPILOGUE_BARRIER:
        h = jax.lax.optimization_barrier(h)
    x = x + h
    h = mlp(p["mlp"], layer_norm(p["norm2"], x, ln_eps), approx_gelu=approx_gelu, int8_dense=int8_dense)
    if "ls2" in p:
        h = h * p["ls2"]["gamma"].astype(h.dtype)
    if use_dp:
        h = drop_path(dp2, h, drop_path_rate)
    if _EPILOGUE_BARRIER:
        h = jax.lax.optimization_barrier(h)
    return x + h


# ---------------------------------------------------------------------------
# PatchEmbed
# ---------------------------------------------------------------------------


def patch_embed_init(key, patch_size: int, in_chans: int, embed_dim: int):
    return {"proj": conv_init(key, patch_size, patch_size, in_chans, embed_dim)}


def patch_embed(p, x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C_in) NHWC image -> (B, N, D) patch tokens.

    Patchify-as-matmul: a stride-p conv with kernel p is a reshape + one dense
    matmul, which maps straight onto the MXU instead of a conv kernel.
    """
    B, H, W, C = x.shape
    if H % patch_size or W % patch_size:
        raise ValueError(f"image size {(H, W)} not divisible by patch size {patch_size}")
    gh, gw = H // patch_size, W // patch_size
    x = x.reshape(B, gh, patch_size, gw, patch_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, patch_size * patch_size * C)
    # HWIO kernel -> ((p*p*C), D) matrix with matching (ph, pw, C) index order
    w = p["proj"]["w"].astype(x.dtype).reshape(patch_size * patch_size * C, -1)
    y = x @ w
    if "b" in p["proj"]:
        y = y + p["proj"]["b"].astype(x.dtype)
    return y
