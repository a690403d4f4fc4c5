"""DINOv2 ViT patch embedder (vit_small/base/large/giant2).

Mirrors /root/reference/omnivggt/layers/vision_transformer.py:42-397 used as the
aggregator's patch embed: conv patchify, cls token + learned pos embed (bicubic
interpolation for non-square inputs, vision_transformer.py:180-212), register
tokens inserted after the pos-embed add, `depth` pre-LN blocks (LayerScale
init 1.0, LN eps 1e-6, no qk-norm, no RoPE), final LayerNorm. The aggregator
consumes only `x_norm_patchtokens` (models/aggregator.py:231-232), so that is
what `apply` returns.

TPU-first: the `depth` blocks run as one `lax.scan` over stacked parameters
(one compiled block body, reused), tokens stay (B, N, C) with N = 1 + 4 + gh*gw.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from omnivggt_tpu.config import DinoV2Config
from omnivggt_tpu.ops import layers as L
from omnivggt_tpu.ops.resize import interpolate


def init(key, cfg: DinoV2Config):
    ks = jax.random.split(key, cfg.depth + 3)
    params = {
        "patch_embed": L.patch_embed_init(ks[0], cfg.patch_size, cfg.in_chans, cfg.embed_dim),
        "cls_token": jnp.zeros((1, 1, cfg.embed_dim), jnp.float32),
        "pos_embed": jax.random.normal(ks[1], (1, cfg.num_patches + 1, cfg.embed_dim)) * 0.02,
        "norm": L.layer_norm_init(cfg.embed_dim),
        "blocks": jax.vmap(
            lambda k: L.block_init(
                k,
                cfg.embed_dim,
                cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                init_values=cfg.init_values,
                qk_norm=cfg.qk_norm,
                ffn_layer=cfg.ffn_layer,
            )
        )(jnp.stack(ks[3 : 3 + cfg.depth])),
    }
    if cfg.num_register_tokens:
        params["register_tokens"] = jnp.zeros(
            (1, cfg.num_register_tokens, cfg.embed_dim), jnp.float32
        )
    return params


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, grid_h: int, grid_w: int,
    antialias: bool = True, offset: float = 0.0,
) -> jnp.ndarray:
    """Resample the (1, 1+M*M, D) learned pos embed to a (grid_h, grid_w) patch
    grid with torch bicubic semantics; cls entry passes through.

    The reference exposes a historical `interpolate_offset` kludge
    (vision_transformer.py:180-212: scale factors of (g + offset) / M fed to
    F.interpolate via scale_factor). The checkpointed OmniVGGT backbone uses
    offset 0 (models/aggregator.py:156-157); a nonzero offset is refused
    loudly here rather than silently resampling with different semantics."""
    if offset:
        raise NotImplementedError(
            "interpolate_offset != 0 (the reference's historical "
            "scale-factor kludge) is not implemented; the OmniVGGT "
            "checkpoint uses offset 0"
        )
    n = pos_embed.shape[1] - 1
    if grid_h * grid_w == n and grid_h == grid_w:
        return pos_embed
    M = int(math.isqrt(n))
    assert M * M == n, f"pos embed is not square: {n}"
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, M, M, -1)
    patch_pe = interpolate(
        patch_pe, (grid_h, grid_w), mode="bicubic", align_corners=False,
        antialias=antialias,
    )
    patch_pe = patch_pe.reshape(1, grid_h * grid_w, -1)
    return jnp.concatenate([cls_pe, patch_pe], axis=1)


def apply(
    params,
    images: jnp.ndarray,
    cfg: DinoV2Config,
    *,
    attn_impl: str = "auto",
    shard=None,
    approx_gelu: bool = False,
    int8_dense=False,
    int8_qk: bool = False,
    pad_tokens: bool = True,
):
    """(B, H, W, 3) NHWC (already mean/std-normalised) -> (B, gh*gw, D)
    final-LayerNorm'd patch tokens.

    pad_tokens: sublane-align the token count (serving/inference default).
    Training turns it off: the masked backward is fused too, but kv_valid
    masking costs an extra compare/select pass over every score tile in
    both backward kernels, while the unpadded path masks nothing — the
    forward re-tile it would save is cheaper than that."""
    B, H, W, _ = images.shape
    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    dtype = images.dtype

    x = L.patch_embed(params["patch_embed"], images, cfg.patch_size)  # (B, N, D)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + interpolate_pos_embed(
        params["pos_embed"], gh, gw,
        antialias=cfg.interpolate_antialias, offset=cfg.interpolate_offset,
    ).astype(dtype)

    if "register_tokens" in params:
        reg = jnp.broadcast_to(
            params["register_tokens"].astype(dtype),
            (B, cfg.num_register_tokens, cfg.embed_dim),
        )
        x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)

    # sublane-align the token count (N % 8 == 0) before the block scan: the
    # block's flattened (B*N, hidden) MLP matmuls then reshape back to the
    # batched (B, N, hidden) layout as a free bitcast instead of a physical
    # re-tile (at 518 px N = 1374 ≡ 6 mod 8; the re-tile measured ~9 ms of
    # the S=8 forward). Pad tokens are masked out of attention as keys
    # (kv_valid valid-prefix masking — exact: masked keys get weight 0.0),
    # and LN/MLP act per-token, so valid-token outputs are bit-identical;
    # the pad rows are sliced off with the cls/register prefix below.
    n_valid = x.shape[1]
    n_pad = (-n_valid) % 8 if pad_tokens else 0
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))

    def body(x, block_params):
        x = L.block(
            block_params,
            x,
            num_heads=cfg.num_heads,
            ln_eps=cfg.ln_eps,
            attn_impl=attn_impl,
            shard=shard,
            kv_valid=n_valid if n_pad else None,
            approx_gelu=approx_gelu,
            int8_dense=int8_dense,
            int8_qk=int8_qk,
        )
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = L.layer_norm(params["norm"], x, cfg.ln_eps)
    return x[:, 1 + cfg.num_register_tokens : n_valid]
