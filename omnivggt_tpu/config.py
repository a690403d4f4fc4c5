"""Frozen configuration dataclasses for the OmniVGGT-TPU model family.

The canonical hyper-parameters follow the reference constructor defaults
(/root/reference/omnivggt/models/omnivggt.py:11-17,
 /root/reference/omnivggt/models/omnivggt_aggregator.py:19-37,
 /root/reference/omnivggt/models/aggregator.py:52-71,
 /root/reference/omnivggt/heads/camera_head.py:26-37,
 /root/reference/omnivggt/heads/dpt_head.py:43-56,
 /root/reference/omnivggt/layers/vision_transformer.py:369-380).

Everything is a frozen dataclass so configs hash and can be closed over by jit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    """DINOv2 ViT backbone used as the patch embedder (vit_large defaults)."""

    img_size: int = 518
    patch_size: int = 14
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    # layerscale init for the DINOv2 blocks (reference passes init_values=1.0,
    # aggregator.py:159)
    init_values: float = 1.0
    ln_eps: float = 1e-6
    qk_norm: bool = False
    # "mlp" | "swiglu" | "swiglufused" (vision_transformer.py:121-126)
    ffn_layer: str = "mlp"
    # bicubic pos-embed interpolation settings (aggregator.py:156-157)
    interpolate_antialias: bool = True
    interpolate_offset: float = 0.0

    @property
    def num_patches(self) -> int:
        g = self.img_size // self.patch_size
        return g * g


def vit_small(**kw) -> DinoV2Config:
    return DinoV2Config(embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(**kw) -> DinoV2Config:
    return DinoV2Config(embed_dim=768, depth=12, num_heads=12, **kw)


def vit_large(**kw) -> DinoV2Config:
    return DinoV2Config(embed_dim=1024, depth=24, num_heads=16, **kw)


def vit_giant2(**kw) -> DinoV2Config:
    return DinoV2Config(embed_dim=1536, depth=40, num_heads=24, **kw)


@dataclasses.dataclass(frozen=True)
class AggregatorConfig:
    """Alternating frame/global attention aggregator with modality injection
    (the ZeroAggregator of the reference)."""

    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    # "dinov2_vitl14_reg" | "dinov2_vitb14_reg" | "dinov2_vits14_reg" |
    # "dinov2_vitg2_reg" | "conv"
    patch_embed: str = "dinov2_vitl14_reg"
    aa_order: Tuple[str, ...] = ("frame", "global")
    qk_norm: bool = True
    rope_freq: float = 100.0
    init_values: float = 0.01
    ln_eps: float = 1e-5  # torch nn.LayerNorm default (blocks use the default)
    # auxiliary-modality injection (omnivggt_aggregator.py:57-80)
    pose_hidden_dim: int = 9
    # stochastic depth on the frame/global blocks, train-only (the reference
    # Block's drop_path, layers/block.py:88-103; applied when the caller
    # passes a train rng)
    drop_path_rate: float = 0.0

    @property
    def patch_start_idx(self) -> int:
        return 1 + self.num_register_tokens

    @property
    def num_groups(self) -> int:
        # one input-injection group + one per layer (omnivggt_aggregator.py:61)
        return self.depth + 1

    @property
    def backbone(self) -> DinoV2Config:
        factories = {
            "dinov2_vitl14_reg": vit_large,
            "dinov2_vitb14_reg": vit_base,
            "dinov2_vits14_reg": vit_small,
            "dinov2_vitg2_reg": vit_giant2,
        }
        if self.patch_embed not in factories:
            raise ValueError(f"not a ViT patch embed: {self.patch_embed}")
        return factories[self.patch_embed](
            img_size=self.img_size,
            patch_size=self.patch_size,
            num_register_tokens=self.num_register_tokens,
        )


@dataclasses.dataclass(frozen=True)
class CameraHeadConfig:
    """Iterative camera pose refinement head (camera_head.py:26-37)."""

    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 0.01
    target_dim: int = 9  # absT_quaR_FoV
    num_iterations: int = 4
    trans_act: str = "linear"
    quat_act: str = "linear"
    fl_act: str = "relu"
    ln_eps: float = 1e-5
    adaln_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class DPTHeadConfig:
    """DPT dense-prediction head (dpt_head.py:43-56)."""

    dim_in: int = 2048
    patch_size: int = 14
    output_dim: int = 4
    activation: str = "inv_log"
    conf_activation: str = "expp1"
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)
    pos_embed: bool = True
    feature_only: bool = False
    down_ratio: int = 1
    frames_chunk_size: int = 8
    ln_eps: float = 1e-5
    # "none" | "int8": W8A8 for the heavy 3x3 convs (RCU, layer_rn,
    # output convs — not the final regression 1x1). Set via
    # OmniVGGTConfig.head_quant; see ops/layers.qconv2d_int8.
    quant: str = "none"


@dataclasses.dataclass(frozen=True)
class OmniVGGTConfig:
    """Top-level model: aggregator + camera head + depth head + point head
    (omnivggt.py:10-17)."""

    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    aggregator: AggregatorConfig = dataclasses.field(default_factory=AggregatorConfig)
    camera_head: CameraHeadConfig = dataclasses.field(default_factory=CameraHeadConfig)
    depth_head: DPTHeadConfig = dataclasses.field(
        default_factory=lambda: DPTHeadConfig(output_dim=2, activation="exp")
    )
    point_head: DPTHeadConfig = dataclasses.field(
        default_factory=lambda: DPTHeadConfig(output_dim=4, activation="inv_log")
    )
    # compute dtype for the aggregator trunk; heads default to fp32
    # (the reference wraps heads in autocast(enabled=False), omnivggt.py:45)
    compute_dtype: str = "bfloat16"
    # head compute dtype — "bfloat16" trades a small accuracy delta for
    # faster dense heads; fp32 is the reference-parity default
    head_dtype: str = "float32"
    # tanh-form GELU in the trunk (aggregator + DINOv2) instead of the
    # reference's exact erf — error below bf16 rounding, ~+10% throughput;
    # off by default (bit parity), certified on at checkpoint load
    # (models/omnivggt.certify_fast_modes)
    approx_gelu: bool = False
    # trunk dense-layer quantisation: "none" | "int8" (W8A8 — per-channel
    # weight + dynamic per-row activation scales, int8 MXU matmuls at 2x the
    # bf16 rate; ~1.3x measured on the trunk MLP shapes after quant/dequant
    # overhead). Off by default; the checkpoint-load certification ladder
    # (models/omnivggt.certify_fast_modes) enables it only when the probe
    # deltas stay within the serving tolerance for the loaded weights.
    trunk_quant: str = "none"
    # attention score-matmul quantisation: "none" | "int8" — the flash
    # kernel quantises q/k per head (symmetric max-abs) and runs q @ k^T on
    # the 2x-rate int8 MXU, dequantising with a per-head scalar fused into
    # the exp pass (ops/pallas/flash_attention.py qk_int8). Measured -25%
    # kernel time at the global-attention shape with ~1e-4 output deltas on
    # qk-normed inputs. Serving-only; certified per-checkpoint by the same
    # ladder as trunk_quant.
    attn_quant: str = "none"
    # DPT-head conv quantisation: "none" | "int8" — W8A8 for the heavy 3x3
    # convs (ops/layers.qconv2d_int8; the final regression 1x1 stays
    # full-precision). Serving-only. Measured (r4, tools/bench_int8_conv.py
    # + paired bench runs): per-conv w8a8 is 1.15-1.49x bf16 (int8-raw only
    # ~1.0-1.4x — XLA lowers s8 convs but not at the 2x MXU rate), which
    # nets +1% end-to-end ON THE INT8 TRUNK RUNG (21.31 -> 21.51 views/s)
    # and exactly neutral on the bf16-heads modes — so the certification
    # ladder probes this as an upgrade only when the int8 trunk rung wins
    # (models/omnivggt.certify_fast_modes).
    head_quant: str = "none"
    # permit the fixed-max flash softmax for qk-normed attention (exact up to
    # float rounding while the weight-dependent logit bound holds; checkpoint
    # loading verifies the bound via utils/validation.qk_logit_bound and
    # flips this off for pathological weights)
    bounded_attn_logits: bool = True

    def __post_init__(self):
        # propagate top-level sizes into the aggregator AND the heads,
        # mirroring the reference constructor plumbing (omnivggt.py:14-17:
        # heads always take dim_in = 2 * embed_dim and the model patch size).
        agg = dataclasses.replace(
            self.aggregator,
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
        )
        object.__setattr__(self, "aggregator", agg)
        object.__setattr__(
            self,
            "camera_head",
            dataclasses.replace(self.camera_head, dim_in=2 * self.embed_dim),
        )
        for name in ("depth_head", "point_head"):
            object.__setattr__(
                self,
                name,
                dataclasses.replace(
                    getattr(self, name),
                    dim_in=2 * self.embed_dim,
                    patch_size=self.patch_size,
                    quant=self.head_quant,
                ),
            )
        if self.trunk_quant not in ("none", "int8", "int8_ln"):
            raise ValueError(
                "trunk_quant must be 'none', 'int8', or 'int8_ln', "
                f"got {self.trunk_quant!r}"
            )
        if self.attn_quant not in ("none", "int8"):
            raise ValueError(
                f"attn_quant must be 'none' or 'int8', got {self.attn_quant!r}"
            )
        if self.head_quant not in ("none", "int8"):
            raise ValueError(
                f"head_quant must be 'none' or 'int8', got {self.head_quant!r}"
            )

    @property
    def trunk_dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def heads_dtype(self):
        return jnp.dtype(self.head_dtype)


def tiny_test_config(
    img_size: int = 28,
    embed_dim: int = 64,
    depth: int = 2,
    num_heads: int = 2,
    patch_embed: str = "conv",
) -> OmniVGGTConfig:
    """A small config for CPU tests: conv patch embed, few blocks, tiny dims."""
    return OmniVGGTConfig(
        img_size=img_size,
        embed_dim=embed_dim,
        aggregator=AggregatorConfig(
            embed_dim=embed_dim,
            depth=depth,
            num_heads=num_heads,
            patch_embed=patch_embed,
        ),
        camera_head=CameraHeadConfig(dim_in=2 * embed_dim, trunk_depth=2, num_heads=2),
        depth_head=DPTHeadConfig(
            dim_in=2 * embed_dim,
            output_dim=2,
            activation="exp",
            features=16,
            out_channels=(16, 32, 64, 64),
            intermediate_layer_idx=tuple(
                min(i, depth - 1) for i in (0, max(depth // 2 - 1, 0), depth - 2, depth - 1)
            ),
        ),
        point_head=DPTHeadConfig(
            dim_in=2 * embed_dim,
            output_dim=4,
            activation="inv_log",
            features=16,
            out_channels=(16, 32, 64, 64),
            intermediate_layer_idx=tuple(
                min(i, depth - 1) for i in (0, max(depth // 2 - 1, 0), depth - 2, depth - 1)
            ),
        ),
        compute_dtype="float32",
    )
