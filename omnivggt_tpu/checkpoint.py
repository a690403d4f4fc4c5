"""Checkpoint conversion: reference PyTorch state_dict / safetensors -> pytree.

The reference ships a single safetensors file loaded strictly
(/root/reference/inference.py:322-325). This module maps every tensor in that
state_dict onto our parameter pytree with the explicit layout conversions:

  - nn.Linear weight (out, in)        -> (in, out)
  - nn.Conv2d weight OIHW             -> HWIO
  - nn.ConvTranspose2d weight         -> kept (in, out, kh, kw) (consumed by the
                                         matmul pixel-shuffle deconv)
  - per-layer ModuleLists (24 frame / 24 global blocks, 25 injection groups,
    DPT projects/refinenets) -> stacked leading-dim arrays / lists

`convert_state_dict` consumes each reference tensor exactly once and raises on
leftovers — the functional equivalent of the reference's strict=True load.
Orbax round-trips native checkpoints.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from omnivggt_tpu.config import OmniVGGTConfig


class _Consumer:
    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = dict(sd)

    def take(self, name: str) -> np.ndarray:
        if name not in self.sd:
            raise KeyError(f"checkpoint missing tensor: {name}")
        return np.asarray(self.sd.pop(name))

    def linear(self, prefix: str, bias: bool = True):
        p = {"w": jnp.asarray(self.take(f"{prefix}.weight").T)}
        if bias:
            p["b"] = jnp.asarray(self.take(f"{prefix}.bias"))
        return p

    def conv(self, prefix: str, bias: bool = True):
        w = self.take(f"{prefix}.weight")  # OIHW
        p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
        if bias:
            p["b"] = jnp.asarray(self.take(f"{prefix}.bias"))
        return p

    def norm(self, prefix: str):
        return {
            "scale": jnp.asarray(self.take(f"{prefix}.weight")),
            "bias": jnp.asarray(self.take(f"{prefix}.bias")),
        }

    def raw(self, name: str):
        return jnp.asarray(self.take(name))


def _block(c: _Consumer, prefix: str, qk_norm: bool, has_ls: bool, swiglu: bool = False):
    if swiglu:
        ffn = {
            "w12": c.linear(f"{prefix}.mlp.w12"),
            "w3": c.linear(f"{prefix}.mlp.w3"),
        }
    else:
        ffn = {
            "fc1": c.linear(f"{prefix}.mlp.fc1"),
            "fc2": c.linear(f"{prefix}.mlp.fc2"),
        }
    p = {
        "norm1": c.norm(f"{prefix}.norm1"),
        "attn": {
            "qkv": c.linear(f"{prefix}.attn.qkv"),
            "proj": c.linear(f"{prefix}.attn.proj"),
        },
        "norm2": c.norm(f"{prefix}.norm2"),
        "mlp": ffn,
    }
    if qk_norm:
        p["attn"]["q_norm"] = c.norm(f"{prefix}.attn.q_norm")
        p["attn"]["k_norm"] = c.norm(f"{prefix}.attn.k_norm")
    if has_ls:
        p["ls1"] = {"gamma": c.raw(f"{prefix}.ls1.gamma")}
        p["ls2"] = {"gamma": c.raw(f"{prefix}.ls2.gamma")}
    return p


def _stack_blocks(blocks):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _dinov2(
    c: _Consumer, prefix: str, depth: int, num_register_tokens: int, swiglu: bool = False
):
    p = {
        "patch_embed": {"proj": c.conv(f"{prefix}.patch_embed.proj")},
        "cls_token": c.raw(f"{prefix}.cls_token"),
        "pos_embed": c.raw(f"{prefix}.pos_embed"),
        "norm": c.norm(f"{prefix}.norm"),
        "blocks": _stack_blocks(
            [
                _block(c, f"{prefix}.blocks.{i}", qk_norm=False, has_ls=True, swiglu=swiglu)
                for i in range(depth)
            ]
        ),
    }
    if num_register_tokens:
        p["register_tokens"] = c.raw(f"{prefix}.register_tokens")
    return p


def _dpt_head(c: _Consumer, prefix: str):
    def rcu(pfx):
        return {"conv1": c.conv(f"{pfx}.conv1"), "conv2": c.conv(f"{pfx}.conv2")}

    def fusion(pfx, has_residual=True):
        p = {"out_conv": c.conv(f"{pfx}.out_conv"), "rcu2": rcu(f"{pfx}.resConfUnit2")}
        if has_residual:
            p["rcu1"] = rcu(f"{pfx}.resConfUnit1")
        return p

    return {
        "norm": c.norm(f"{prefix}.norm"),
        "projects": [c.conv(f"{prefix}.projects.{i}") for i in range(4)],
        "resize": [
            {  # ConvTranspose2d kept (in, out, kh, kw)
                "w": c.raw(f"{prefix}.resize_layers.0.weight"),
                "b": c.raw(f"{prefix}.resize_layers.0.bias"),
            },
            {
                "w": c.raw(f"{prefix}.resize_layers.1.weight"),
                "b": c.raw(f"{prefix}.resize_layers.1.bias"),
            },
            None,
            c.conv(f"{prefix}.resize_layers.3"),
        ],
        "layer_rn": [
            {"w": c.conv(f"{prefix}.scratch.layer{i}_rn", bias=False)["w"]}
            for i in (1, 2, 3, 4)
        ],
        "refinenet1": fusion(f"{prefix}.scratch.refinenet1"),
        "refinenet2": fusion(f"{prefix}.scratch.refinenet2"),
        "refinenet3": fusion(f"{prefix}.scratch.refinenet3"),
        "refinenet4": fusion(f"{prefix}.scratch.refinenet4", has_residual=False),
        "output_conv1": c.conv(f"{prefix}.scratch.output_conv1"),
        "output_conv2": {
            "conv1": c.conv(f"{prefix}.scratch.output_conv2.0"),
            "conv2": c.conv(f"{prefix}.scratch.output_conv2.2"),
        },
    }


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: OmniVGGTConfig):
    """Convert a reference OmniVGGT state_dict (name -> numpy array) into our
    parameter pytree. Raises if any tensor is missing or unconsumed."""
    c = _Consumer(sd)
    acfg = cfg.aggregator
    depth = acfg.depth

    if acfg.patch_embed == "conv":
        patch_embed = {"proj": c.conv("aggregator.patch_embed.proj")}
    else:
        bcfg = acfg.backbone
        patch_embed = _dinov2(
            c,
            "aggregator.patch_embed",
            bcfg.depth,
            bcfg.num_register_tokens,
            swiglu=bcfg.ffn_layer in ("swiglu", "swiglufused"),
        )

    import jax

    aggregator = {
        "patch_embed": patch_embed,
        "camera_token": c.raw("aggregator.camera_token"),
        "register_token": c.raw("aggregator.register_token"),
        "frame_blocks": _stack_blocks(
            [_block(c, f"aggregator.frame_blocks.{i}", acfg.qk_norm, True) for i in range(depth)]
        ),
        "global_blocks": _stack_blocks(
            [_block(c, f"aggregator.global_blocks.{i}", acfg.qk_norm, True) for i in range(depth)]
        ),
        "pose_embeddings": _stack_blocks(
            [c.linear(f"aggregator.pose_embeddings.{g}") for g in range(acfg.num_groups)]
        ),
        "camera_adapters": _stack_blocks(
            [c.linear(f"aggregator.camera_adapters.{g}") for g in range(acfg.num_groups)]
        ),
        "depth_placeholder": c.raw("aggregator.depth_placeholder"),
        "depth_patch_embed": {"proj": c.conv("aggregator.depth_patch_embed.proj")},
    }

    camera_head = {
        "trunk": _stack_blocks(
            [
                _block(c, f"camera_head.trunk.{i}", qk_norm=False, has_ls=True)
                for i in range(cfg.camera_head.trunk_depth)
            ]
        ),
        "token_norm": c.norm("camera_head.token_norm"),
        "trunk_norm": c.norm("camera_head.trunk_norm"),
        "empty_pose_tokens": c.raw("camera_head.empty_pose_tokens"),
        "embed_pose": c.linear("camera_head.embed_pose"),
        "poseLN_modulation": c.linear("camera_head.poseLN_modulation.1"),
        "pose_branch": {
            "fc1": c.linear("camera_head.pose_branch.fc1"),
            "fc2": c.linear("camera_head.pose_branch.fc2"),
        },
    }

    params = {
        "aggregator": aggregator,
        "camera_head": camera_head,
        "depth_head": _dpt_head(c, "depth_head"),
        "point_head": _dpt_head(c, "point_head"),
    }

    # ignore torch buffers that are constants on our side
    for k in list(c.sd):
        if k.endswith(("_resnet_mean", "_resnet_std")) or ".rope." in k:
            c.sd.pop(k)
    if c.sd:
        raise ValueError(
            f"{len(c.sd)} unconsumed checkpoint tensors, e.g. {sorted(c.sd)[:8]}"
        )
    return params


def load_safetensors_params(path: str, cfg: OmniVGGTConfig):
    from safetensors.numpy import load_file

    return convert_state_dict(load_file(path), cfg)


# ---------------------------------------------------------------------------
# Native (orbax) checkpoints
# ---------------------------------------------------------------------------


def save_orbax(path: str, params) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)


# ---------------------------------------------------------------------------
# Serving-side weight compression
# ---------------------------------------------------------------------------


def cast_trunk_params(params, dtype=None):
    """Store the trunk (aggregator + DINOv2) weights in bf16.

    Every trunk weight is cast to the bf16 activation dtype at its point of
    use (ops/layers.py linear/conv, models/aggregator.py adapters/tokens),
    so storage-time rounding is *morally* a no-op — but NOT bit-exact in
    practice: XLA runs with allow_excess_precision, which legally folds the
    f32 -> bf16 -> f32 convert chains and lets stored-f32 weights flow at
    full precision. Measured effect of bf16 storage on the full forward:
    <= ~1e-5 absolute on dense outputs (dominated by the patchify conv,
    whose input activations are at the fp32 boundary), ~1e-7 elsewhere.
    In exchange: half the trunk's HBM footprint (~2.4 GB on the 1.2B
    flagship) and half its per-forward weight streaming.

    Deliberately left in fp32:
      - LayerNorm scale/bias everywhere (consumed inside the fp32
        normalisation, ops/layers.py:68-76);
      - the DINOv2 pos_embed table (bicubic-interpolated in fp32 BEFORE the
        activation-dtype cast, models/dinov2.py:80);
      - all head parameters (heads compute fp32, reference autocast policy).

    For inference/serving only — training must keep fp32 master weights.
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16

    def cast(node, name=None):
        if isinstance(node, dict):
            if set(node) == {"scale", "bias"}:  # LayerNorm — fp32-consumed
                return node
            return {k: (v if k == "pos_embed" else cast(v, k))
                    for k, v in node.items()}
        if hasattr(node, "dtype") and jnp.issubdtype(node.dtype, jnp.floating):
            return node.astype(dtype)
        return node

    out = dict(params)
    out["aggregator"] = cast(params["aggregator"])
    return out
