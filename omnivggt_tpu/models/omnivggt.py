"""OmniVGGT top-level model: aggregator + camera head + depth head + point head.

Mirrors /root/reference/omnivggt/models/omnivggt.py:10-68. The forward returns
the reference's prediction dict:
  {pose_enc, pose_enc_list, depth, depth_conf, world_points, world_points_conf,
   images}
with channels-last layouts (depth: (B,S,H,W,1), world_points: (B,S,H,W,3),
images: (B,S,H,W,3)).

The aggregator trunk runs in `config.compute_dtype` (bfloat16 by default on
TPU); the heads always run fp32 (reference: autocast(enabled=False),
omnivggt.py:45). Only the aggregator layers consumed by the heads are
materialised.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omnivggt_tpu.config import OmniVGGTConfig
from omnivggt_tpu.models import aggregator as agg
from omnivggt_tpu.models import camera_head as chead
from omnivggt_tpu.models import dpt_head as dhead
from omnivggt_tpu.models.aggregator import AuxInputs


def needed_layers(cfg: OmniVGGTConfig):
    """Union of aggregator layers the heads consume, sorted ascending.
    The camera head uses the last layer; DPT heads use their
    intermediate_layer_idx."""
    layers = {cfg.aggregator.depth - 1}
    layers.update(cfg.depth_head.intermediate_layer_idx)
    layers.update(cfg.point_head.intermediate_layer_idx)
    return tuple(sorted(layers))


def init(key, cfg: OmniVGGTConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "aggregator": agg.init(k1, cfg.aggregator),
        "camera_head": chead.init(k2, cfg.camera_head),
        "depth_head": dhead.init(k3, cfg.depth_head),
        "point_head": dhead.init(k4, cfg.point_head),
    }


def apply(
    params,
    images: jnp.ndarray,
    cfg: OmniVGGTConfig,
    aux: Optional[AuxInputs] = None,
    *,
    attn_impl: str = "auto",
    sharding=None,
    remat=False,  # False | True/'full' | 'dots' (aggregator remat policy)
    train_rng=None,
    num_valid_frames=None,
    pad_tokens: bool = True,
):
    """Full forward pass.

    Args:
        images: (B, S, H, W, 3) NHWC float in [0, 1] (a (S, H, W, 3) array is
            promoted to B=1, mirroring omnivggt.py:31-32).
        aux: optional AuxInputs with GT camera/depth + frame masks.
        sharding: optional parallel.sharding.ModelSharding for multi-chip
            execution.
        train_rng: optional PRNGKey enabling train-time stochastic depth
            (cfg.aggregator.drop_path_rate); None = deterministic eval.
        num_valid_frames: optional traced int32 scalar — frames at positions
            >= num_valid_frames are shape padding (bucketed serving) and are
            masked out of all cross-frame attention, so real-frame outputs
            equal the unpadded forward's.

    Returns:
        prediction dict (all fp32 except `images`).
    """
    if images.ndim == 4:
        images = images[None]
    B, S, H, W, _ = images.shape
    out_layers = needed_layers(cfg)

    tokens_buf, patch_start_idx = agg.apply(
        params["aggregator"],
        images,
        cfg.aggregator,
        aux,
        output_layers=out_layers,
        dtype=cfg.trunk_dtype,
        attn_impl=attn_impl,
        sharding=sharding,
        remat=remat,
        train_rng=train_rng,
        num_valid_frames=num_valid_frames,
        allow_bounded=cfg.bounded_attn_logits,
        approx_gelu=cfg.approx_gelu,
        int8_dense=cfg.trunk_quant,
        int8_qk=cfg.attn_quant == "int8",
        pad_tokens=pad_tokens,
    )
    # the buffer stays in the bf16 trunk dtype; each head upcasts the slice
    # (or frame chunk) it consumes — materialising the whole buffer at fp32
    # costs multi-GB at large S for zero precision (the values ARE bf16)
    slot = {l: i for i, l in enumerate(out_layers)}

    predictions = {}
    pose_enc_list = chead.apply(
        params["camera_head"],
        tokens_buf[slot[cfg.aggregator.depth - 1]].astype(cfg.heads_dtype),
        cfg.camera_head,
        num_valid_frames=num_valid_frames,
    )
    predictions["pose_enc"] = pose_enc_list[-1]
    predictions["pose_enc_list"] = pose_enc_list

    depth, depth_conf = dhead.apply(
        params["depth_head"],
        tokens_buf,
        cfg.depth_head,
        (H, W),
        patch_start_idx,
        tuple(slot[l] for l in cfg.depth_head.intermediate_layer_idx),
        dtype=cfg.heads_dtype,
    )
    predictions["depth"] = depth
    predictions["depth_conf"] = depth_conf

    pts3d, pts3d_conf = dhead.apply(
        params["point_head"],
        tokens_buf,
        cfg.point_head,
        (H, W),
        patch_start_idx,
        tuple(slot[l] for l in cfg.point_head.intermediate_layer_idx),
        dtype=cfg.heads_dtype,
    )
    predictions["world_points"] = pts3d
    predictions["world_points_conf"] = pts3d_conf

    predictions["images"] = images
    return predictions


def make_aux(
    S: int,
    extrinsics=None,
    intrinsics=None,
    depth=None,
    mask=None,
    depth_gt_index: Optional[Sequence[int]] = None,
    camera_gt_index: Optional[Sequence[int]] = None,
) -> Optional[AuxInputs]:
    """Build AuxInputs from reference-style index lists
    (omnivggt.py:20-28 call signature)."""
    cam_mask = None
    if camera_gt_index is not None and len(camera_gt_index) > 0:
        if extrinsics is None or intrinsics is None:
            raise ValueError(
                "camera_gt_index requires extrinsics and intrinsics "
                "(frames marked as having camera GT but no camera arrays "
                "were given)"
            )
        cam_mask = np.zeros((S,), bool)
        cam_mask[np.asarray(camera_gt_index)] = True
    d_mask = None
    if depth_gt_index is not None and len(depth_gt_index) > 0:
        if depth is None:
            raise ValueError(
                "depth_gt_index requires a depth array (frames marked as "
                "having depth GT but no depth was given)"
            )
        if mask is None:
            # the reference's normalize_depth asserts depth/mask shapes match
            # (omnivggt_aggregator.py:112) — mask is required alongside depth
            raise ValueError(
                "depth_gt_index requires a validity mask alongside depth "
                "(the depth injection normalises by the mask-mean and embeds "
                "(depth, mask) as a 2-channel patch; pass mask=np.ones(...) "
                "if every depth pixel is valid)"
            )
        d_mask = np.zeros((S,), bool)
        d_mask[np.asarray(depth_gt_index)] = True
    if cam_mask is None and d_mask is None:
        return None
    return AuxInputs(
        extrinsics=None if extrinsics is None else jnp.asarray(extrinsics),
        intrinsics=None if intrinsics is None else jnp.asarray(intrinsics),
        depth=None if depth is None else jnp.asarray(depth),
        depth_valid=None if mask is None else jnp.asarray(mask),
        camera_mask=None if cam_mask is None else jnp.asarray(cam_mask),
        depth_mask=None if d_mask is None else jnp.asarray(d_mask),
    )


def _probe_outputs(params, cfg: OmniVGGTConfig, probe_hw, probe_s):
    """Forward on a small deterministic probe batch; numpy outputs."""
    if probe_hw is None:
        probe_hw = min(140, cfg.img_size)
    probe_hw -= probe_hw % cfg.patch_size
    images = jax.random.uniform(
        jax.random.PRNGKey(0), (1, probe_s, probe_hw, probe_hw, 3), jnp.float32
    )
    out = jax.jit(lambda p, x: apply(p, x, cfg))(params, images)
    return {
        k: np.asarray(out[k])
        for k in ("pose_enc", "depth", "world_points", "depth_conf")
    }


def _probe_failures(ref, fast, pose_tol, rel_tol):
    """Dict of gate violations between two probe-output dicts (empty = pass):
    max-abs on pose_enc, median relative error on the dense outputs."""

    def med_rel(a, b, floor=1e-3):
        a = a.astype(np.float64)
        b = b.astype(np.float64)
        return float(np.median(np.abs(a - b) / (np.abs(a) + floor)))

    checks = {
        "pose_enc_maxabs": (
            float(np.max(np.abs(ref["pose_enc"] - fast["pose_enc"]))),
            pose_tol,
        ),
        "depth_medrel": (med_rel(ref["depth"], fast["depth"]), rel_tol),
        "points_medrel": (
            med_rel(ref["world_points"], fast["world_points"]),
            rel_tol,
        ),
        "depth_conf_medrel": (
            med_rel(ref["depth_conf"], fast["depth_conf"]),
            rel_tol,
        ),
    }
    # non-finite metrics (NaN/inf probe outputs) must FAIL the gate — the
    # weight-dependent breakage the ladder exists to catch can surface as
    # NaN diffs, and `NaN > tol` is False
    return {
        k: v
        for k, (v, tol) in checks.items()
        if not np.isfinite(v) or v > tol
    }


def certify_head_dtype(
    params,
    cfg: OmniVGGTConfig,
    *,
    probe_hw: Optional[int] = None,
    probe_s: int = 2,
    pose_tol: float = 2e-2,
    rel_tol: float = 2e-2,
) -> OmniVGGTConfig:
    """Certify-then-default the bf16 dense heads.

    Runs the model twice on a small deterministic probe batch — fp32 heads
    (reference parity: autocast(enabled=False), omnivggt.py:45) vs bf16
    heads — and returns the config with head_dtype="bfloat16" only when the
    probe deltas stay within tolerance (median relative error on depth /
    world-points / confidences, max-abs on pose_enc). Mirrors the
    bounded-logits pattern (_certify_bounded_logits): the fast path is the
    default, but only when the loaded weights provably keep it accurate;
    fp32 stays the fallback and can be forced via head_dtype="float32".

    The probe runs at 140 px (or the model's img_size if smaller) so the
    certification costs two small compiles, not two full-resolution ones.

    NOTE: production loaders run the full certify_fast_modes ladder (of
    which this is the bf16-heads-only rung); this entry point remains for
    callers who want exactly that one trade-off. Both share _probe_outputs
    and _probe_failures, so gates cannot drift between them.
    """
    import dataclasses

    if cfg.head_dtype != "float32":
        return cfg  # caller already chose; nothing to certify

    ref = _probe_outputs(params, cfg, probe_hw, probe_s)
    bf16_cfg = dataclasses.replace(cfg, head_dtype="bfloat16")
    failed = _probe_failures(
        ref, _probe_outputs(params, bf16_cfg, probe_hw, probe_s),
        pose_tol, rel_tol,
    )
    if failed:
        import logging

        logging.getLogger(__name__).warning(
            "bf16-head certification failed (%s); keeping fp32 heads",
            ", ".join(f"{k}={v:.4g}" for k, v in failed.items()),
        )
        return cfg
    return bf16_cfg


def certify_fast_modes(
    params,
    cfg: OmniVGGTConfig,
    *,
    probe_hw: Optional[int] = None,
    probe_s: int = 2,
    pose_tol: float = 2e-2,
    rel_tol: float = 2e-2,
    final_hw: int = 448,
) -> OmniVGGTConfig:
    """Certify-then-default the fast serving modes, most aggressive first:

      1. int8 trunk + bf16 heads + tanh GELU     (W8A8 dense, 2x-rate MXU;
         21.10 views/s S=8 with the attn upgrade below, 18.86 without)
      2. int8_ln trunk + bf16 heads + tanh GELU  (qkv/fc1 only — the
         LayerNorm-fed matmuls, whose outputs pass through qk-norm / GELU
         rather than writing the residual stream; 18.40 views/s at ~0.6x
         the full-int8 pose delta — 0.036 vs 0.060 on random flagship init)
      3. bf16 dense heads + tanh-GELU trunk      (19.75 views/s with the
         attn upgrade, 17.60 without)
      4. bf16 dense heads                        (15.31 views/s)
      5. fp32 heads + exact erf GELU             (reference parity, fallback)

    Two-stage gating, both against the reference-parity forward:

      - **Ladder stage** at `probe_hw` (default 140 px — cheap compiles):
        candidates are walked most-aggressive-first; the first to pass is
        the provisional winner.
      - **Final stage** at `final_hw` (default 448 px — the serving-
        representative probe): the provisional winner is re-gated at a
        resolution where the DPT upsample magnitudes match serving and
        every attention family (frame / global / DINOv2) crosses its flash
        dispatch threshold (ops/attention._FLASH_MIN_SEQ = 1024 tokens:
        140 px gives 105 tokens/frame, 448 px gives 1029). A winner that
        passes at 140 but fails at 448 steps DOWN the ladder, re-gated at
        448, until a rung passes (else the parity fallback). When the two
        probe resolutions coincide (tiny test configs) the stage is skipped
        — the ladder gate already ran at that resolution.

    Independently, the final winner is probed once more with
    attn_quant="int8" (int8-qk flash score matmuls, ~1e-4 deltas on
    qk-normed inputs) at `final_hw` and keeps the upgrade when the gates
    still pass AGAINST THE REFERENCE-PARITY forward — gating against the
    winning rung instead would let the served config drift up to 2x the
    advertised tolerance from parity (rung-vs-ref + attn-vs-rung
    compounding). When the int8 trunk rung wins, a head_quant="int8"
    upgrade (W8A8 DPT-head convs) is probed the same way — it measures
    +1% there and neutral elsewhere (tools/bench_int8_conv.py + paired
    end-to-end, r4). Runs only when the caller has not already chosen a
    fast mode.

    Production loaders (from_safetensors / from_pretrained with
    head_dtype="auto") persist the verdict next to the checkpoint keyed by
    a content fingerprint (omnivggt_tpu.certification), so these probe
    compiles are paid once per checkpoint, not once per process.
    """
    import dataclasses
    import logging

    log = logging.getLogger(__name__)

    if (cfg.head_dtype != "float32" or cfg.approx_gelu
            or cfg.trunk_quant != "none" or cfg.attn_quant != "none"
            or cfg.head_quant != "none"):
        return cfg  # caller already chose; nothing to certify

    def snap(hw):
        hw = min(hw, cfg.img_size)
        return hw - hw % cfg.patch_size

    ladder_hw = snap(probe_hw if probe_hw is not None else 140)
    fin_hw = snap(final_hw)

    candidates = [
        dataclasses.replace(
            cfg, head_dtype="bfloat16", approx_gelu=True, trunk_quant="int8"
        ),
        dataclasses.replace(
            cfg, head_dtype="bfloat16", approx_gelu=True, trunk_quant="int8_ln"
        ),
        dataclasses.replace(cfg, head_dtype="bfloat16", approx_gelu=True),
        dataclasses.replace(cfg, head_dtype="bfloat16"),
    ]

    def gate(ref, cand, hw, stage):
        failed = _probe_failures(
            ref, _probe_outputs(params, cand, hw, probe_s), pose_tol, rel_tol
        )
        if failed:
            log.warning(
                "fast-mode certification failed at %dpx (%s) for "
                "head_dtype=%s approx_gelu=%s trunk_quant=%s (%s); "
                "trying the next fallback",
                hw, stage, cand.head_dtype, cand.approx_gelu,
                cand.trunk_quant,
                ", ".join(f"{k}={v:.4g}" for k, v in failed.items()),
            )
        return not failed

    ref = _probe_outputs(params, cfg, ladder_hw, probe_s)
    best, best_idx = cfg, len(candidates)
    for i, cand in enumerate(candidates):
        if gate(ref, cand, ladder_hw, "ladder"):
            best, best_idx = cand, i
            break

    if fin_hw == ladder_hw:
        ref_f = ref  # same resolution: the ladder gate IS the final gate
    else:
        ref_f = _probe_outputs(params, cfg, fin_hw, probe_s)
        if best is not cfg:
            # re-gate the provisional winner (then lower rungs) at the
            # serving-representative resolution
            final_best = cfg
            for cand in candidates[best_idx:]:
                if gate(ref_f, cand, fin_hw, "final"):
                    final_best = cand
                    break
            best = final_best

    upgraded = dataclasses.replace(best, attn_quant="int8")
    failed = _probe_failures(
        ref_f, _probe_outputs(params, upgraded, fin_hw, probe_s),
        pose_tol, rel_tol,
    )
    if not failed:
        best = upgraded
    else:
        log.warning(
            "attn_quant=int8 certification failed (%s); keeping "
            "attn_quant=none",
            ", ".join(f"{k}={v:.4g}" for k, v in failed.items()),
        )

    # head_quant upgrade probe: W8A8 DPT-head convs only pay on the int8
    # trunk rung (paired r4 measurement: 21.31 -> 21.51 views/s there, but
    # EXACTLY neutral on the bf16-heads modes — 19.884 vs 19.890 — where the
    # quantizable 3x3 convs are too small a slice of the heads). Probed at
    # the final resolution (DPT upsample magnitudes match serving) against
    # the parity reference, like the attn upgrade.
    if best.trunk_quant == "int8" and best.head_quant == "none":
        upgraded = dataclasses.replace(best, head_quant="int8")
        failed = _probe_failures(
            ref_f, _probe_outputs(params, upgraded, fin_hw, probe_s),
            pose_tol, rel_tol,
        )
        if not failed:
            best = upgraded
        else:
            log.warning(
                "head_quant=int8 certification failed (%s); keeping "
                "head_quant=none",
                ", ".join(f"{k}={v:.4g}" for k, v in failed.items()),
            )
    return best


def certification_gates(
    probe_hw: Optional[int] = None,
    probe_s: int = 2,
    pose_tol: float = 2e-2,
    rel_tol: float = 2e-2,
    final_hw: int = 448,
) -> dict:
    """The exact gate parameters certify_fast_modes runs with, as the dict
    persisted into (and matched against) a checkpoint certificate."""
    return {
        "probe_hw": probe_hw, "probe_s": probe_s, "pose_tol": pose_tol,
        "rel_tol": rel_tol, "final_hw": final_hw,
    }


def _certify_cached(params, cfg: OmniVGGTConfig, ckpt_path: str,
                    **gate_kwargs) -> OmniVGGTConfig:
    """certify_fast_modes with the verdict persisted next to the checkpoint
    (omnivggt_tpu.certification): a valid cached certificate (matching
    content fingerprint + gates + base modes) skips every probe compile."""
    from omnivggt_tpu.certification import (
        checkpoint_fingerprint, load_certificate, save_certificate,
    )

    gates = certification_gates(**gate_kwargs)
    fp = checkpoint_fingerprint(ckpt_path)
    cached = load_certificate(ckpt_path, cfg, gates, fingerprint=fp)
    if cached is not None:
        # the ladder only ever SETS fast modes; bounded_attn_logits was
        # already re-verified live by the caller on this load
        return cached
    certified = certify_fast_modes(params, cfg, **gate_kwargs)
    save_certificate(ckpt_path, cfg, certified, gates, fingerprint=fp)
    return certified


def _certify_bounded_logits(config: OmniVGGTConfig, params) -> OmniVGGTConfig:
    """Verify the weight-dependent qk-norm logit bound that the fixed-max
    flash softmax relies on; flip config.bounded_attn_logits off when real
    checkpoint weights break it (utils/validation.qk_logit_bound)."""
    import dataclasses

    from omnivggt_tpu.utils.validation import check_bounded_logits_safe

    if not config.bounded_attn_logits:
        return config
    head_dim = config.embed_dim // config.aggregator.num_heads
    if check_bounded_logits_safe(params, head_dim):
        return config
    return dataclasses.replace(config, bounded_attn_logits=False)


class OmniVGGT:
    """Convenience wrapper bundling config + params with a jitted forward.

    Functional core stays in `init`/`apply`; this class only mirrors the
    reference's object API (construct / from_pretrained / __call__ returning
    the prediction dict).
    """

    def __init__(self, config: Optional[OmniVGGTConfig] = None, params=None, seed: int = 0):
        self.config = config or OmniVGGTConfig()
        self.params = (
            params
            if params is not None
            else init(jax.random.PRNGKey(seed), self.config)
        )
        self._jitted = {}

    @classmethod
    def from_safetensors(
        cls,
        path: str,
        config: Optional[OmniVGGTConfig] = None,
        head_dtype: str = "auto",
    ):
        """Load a converted reference checkpoint.

        head_dtype: "auto" (default) walks the full certify_fast_modes
        ladder on load — W8A8 int8 trunk, int8_ln, bf16 heads + tanh GELU,
        bf16 heads — and defaults the most aggressive mode whose probe
        outputs match the fp32 reference-parity forward within tolerance
        (plus the int8-qk attention upgrade probe), with the winner re-gated
        at the 448 px serving-representative probe. The verdict is persisted
        next to the checkpoint (<path>.certified.json, keyed by a content
        fingerprint), so later loads of the same file certify in seconds
        instead of re-compiling the probe forwards. "float32"/"bfloat16"
        force that head dtype and skip the ladder.
        """
        import dataclasses

        from omnivggt_tpu.checkpoint import load_safetensors_params

        config = config or OmniVGGTConfig()
        if head_dtype != "auto":
            config = dataclasses.replace(config, head_dtype=head_dtype)
        params = load_safetensors_params(path, config)
        config = _certify_bounded_logits(config, params)
        if head_dtype == "auto":
            config = _certify_cached(params, config, path)
        return cls(config, params)

    def save_pretrained(self, directory: str) -> str:
        """Native checkpoint: orbax params + config JSON (the counterpart of
        the reference's HF-hub mixin, omnivggt.py:3,10)."""
        import dataclasses
        import json
        import os

        from omnivggt_tpu.checkpoint import save_orbax

        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(self.config), f, indent=2)
        save_orbax(os.path.join(os.path.abspath(directory), "params"), self.params)
        return directory

    @classmethod
    def from_pretrained(cls, directory: str, head_dtype: str = "keep"):
        """Load a native checkpoint saved with save_pretrained, or — when
        given a HF-hub repo id instead of a local directory — download the
        reference safetensors checkpoint from the hub (the counterpart of
        the reference's PyTorchModelHubMixin, omnivggt.py:3,10; requires
        network + huggingface_hub, so it degrades to a clear error offline).

        head_dtype: "keep" (default) respects the saved config's head dtype;
        "auto" re-runs the bf16-head certification probe; "float32"/
        "bfloat16" force that dtype.
        """
        import os as _os
        import re as _re

        # only a plausible 'org/name' id (single slash, no path-like parts)
        # routes to the hub — a typo'd local path should say 'no such
        # directory', not attempt a network download
        looks_like_repo_id = bool(
            _re.fullmatch(r"[A-Za-z0-9][\w.\-]*/[\w.\-]+", directory)
        )
        if not _os.path.isdir(directory) and looks_like_repo_id:
            return cls._from_hub(
                directory,
                head_dtype="auto" if head_dtype == "keep" else head_dtype,
            )
        import json
        import os

        import jax as _jax

        from omnivggt_tpu import config as C
        from omnivggt_tpu.checkpoint import load_orbax

        with open(os.path.join(directory, "config.json")) as f:
            raw = json.load(f)

        def tup(d, keys):
            for k in keys:
                if k in d and isinstance(d[k], list):
                    d[k] = tuple(d[k])
            return d

        cfg = C.OmniVGGTConfig(
            img_size=raw["img_size"],
            patch_size=raw["patch_size"],
            embed_dim=raw["embed_dim"],
            aggregator=C.AggregatorConfig(**tup(raw["aggregator"], ["aa_order"])),
            camera_head=C.CameraHeadConfig(**raw["camera_head"]),
            depth_head=C.DPTHeadConfig(
                **tup(raw["depth_head"], ["out_channels", "intermediate_layer_idx"])
            ),
            point_head=C.DPTHeadConfig(
                **tup(raw["point_head"], ["out_channels", "intermediate_layer_idx"])
            ),
            compute_dtype=raw["compute_dtype"],
            head_dtype=raw.get("head_dtype", "float32"),
            approx_gelu=raw.get("approx_gelu", False),
            trunk_quant=raw.get("trunk_quant", "none"),
            attn_quant=raw.get("attn_quant", "none"),
        )
        if head_dtype not in ("keep", "auto"):
            import dataclasses

            cfg = dataclasses.replace(cfg, head_dtype=head_dtype)
        template = _jax.eval_shape(lambda: init(_jax.random.PRNGKey(0), cfg))
        params = load_orbax(os.path.join(os.path.abspath(directory), "params"), template)
        cfg = _certify_bounded_logits(cfg, params)
        if head_dtype == "auto":
            import dataclasses

            cfg = dataclasses.replace(
                cfg, head_dtype="float32", approx_gelu=False,
                trunk_quant="none", attn_quant="none",
            )
            cfg = _certify_cached(params, cfg, directory)
        return cls(cfg, params)

    @classmethod
    def _from_hub(cls, repo_id: str, head_dtype: str = "auto"):
        """Fetch a reference-layout safetensors checkpoint from the HF hub
        and load it through the converter."""
        import glob
        import os

        try:
            from huggingface_hub import snapshot_download
        except ImportError as e:
            raise RuntimeError(
                f"{repo_id!r} is not a local checkpoint directory and "
                "huggingface_hub is not installed, so it cannot be fetched "
                "from the hub. Download the safetensors file manually and "
                "use OmniVGGT.from_safetensors(path)."
            ) from e
        try:
            snap = snapshot_download(repo_id, allow_patterns=["*.safetensors"])
        except Exception as e:
            raise RuntimeError(
                f"could not download {repo_id!r} from the HF hub (offline "
                "environment?). Download the safetensors file manually and "
                "use OmniVGGT.from_safetensors(path)."
            ) from e
        files = sorted(glob.glob(os.path.join(snap, "**", "*.safetensors"),
                                 recursive=True))
        if not files:
            raise RuntimeError(f"no .safetensors file in hub snapshot {snap!r}")
        if len(files) > 1:
            raise RuntimeError(
                f"hub snapshot {snap!r} contains {len(files)} .safetensors "
                f"files ({[os.path.basename(f) for f in files]}); sharded or "
                "multi-variant checkpoints are ambiguous — pick one and load "
                "it with OmniVGGT.from_safetensors(path)."
            )
        return cls.from_safetensors(files[0], head_dtype=head_dtype)

    def __call__(
        self,
        images,
        extrinsics=None,
        intrinsics=None,
        depth=None,
        mask=None,
        depth_gt_index: Optional[List[int]] = None,
        camera_gt_index: Optional[List[int]] = None,
    ):
        images = jnp.asarray(images)
        if images.ndim == 4:
            images = images[None]
        S = images.shape[1]
        aux = make_aux(
            S, extrinsics, intrinsics, depth, mask, depth_gt_index, camera_gt_index
        )
        has_cam = aux is not None and aux.camera_mask is not None
        has_depth = aux is not None and aux.depth_mask is not None
        key = (images.shape, has_cam, has_depth)
        if key not in self._jitted:
            cfg = self.config

            @jax.jit
            def fwd(params, images, aux):
                return apply(params, images, cfg, aux)

            self._jitted[key] = fwd
        return self._jitted[key](self.params, images, aux)
