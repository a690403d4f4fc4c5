"""Input validation and NaN/failure detection (SURVEY.md §5: the reference's
equivalents are broken/dead — check_valid_tensor with a missing import,
calls to an undefined check_and_fix_inf_nan; this subsystem works).

  - validate_batch: loader-boundary checks (shapes, ranges, finite values,
    camera matrix sanity) with actionable messages.
  - guard_predictions: NaN/Inf scan over a prediction dict.
  - enable_nan_debugging: flips jax_debug_nans for tracing the op that
    produced a NaN.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax

from omnivggt_tpu.utils.pytree import check_valid_array


class ValidationError(ValueError):
    pass


def enable_nan_debugging(enabled: bool = True) -> None:
    jax.config.update("jax_debug_nans", enabled)


def validate_batch(
    images,
    extrinsics=None,
    intrinsics=None,
    depth=None,
    mask=None,
    depth_gt_index: Optional[List[int]] = None,
    camera_gt_index: Optional[List[int]] = None,
    patch_size: int = 14,
) -> None:
    """Validate a model input batch; raises ValidationError with the problem."""
    problems = []
    images = np.asarray(images)
    if images.ndim == 4:
        images = images[None]
    if images.ndim != 5 or images.shape[-1] != 3:
        problems.append(f"images must be (B,S,H,W,3); got {images.shape}")
    else:
        B, S, H, W, _ = images.shape
        if H % patch_size or W % patch_size:
            problems.append(
                f"H={H}, W={W} must be multiples of patch size {patch_size}"
            )
        if images.min() < -1e-3 or images.max() > 1 + 1e-3:
            problems.append(
                f"images must be in [0,1]; got [{images.min():.3f}, {images.max():.3f}]"
            )
        msg = check_valid_array(images, "images")
        if msg:
            problems.append(msg)

        for name, arr, shape in (
            ("extrinsics", extrinsics, (B, S, 3, 4)),
            ("intrinsics", intrinsics, (B, S, 3, 3)),
            ("depth", depth, (B, S, H, W, 1)),
            ("mask", mask, (B, S, H, W)),
        ):
            if arr is None:
                continue
            arr = np.asarray(arr)
            if arr.shape != shape:
                problems.append(f"{name} must be {shape}; got {arr.shape}")
            msg = check_valid_array(arr, name)
            if msg:
                problems.append(msg)

        for name, idx in (("camera_gt_index", camera_gt_index), ("depth_gt_index", depth_gt_index)):
            if idx:
                bad = [i for i in idx if not (0 <= i < S)]
                if bad:
                    problems.append(f"{name} out of range [0,{S}): {bad}")

        if camera_gt_index and intrinsics is not None:
            K = np.asarray(intrinsics)
            for i in camera_gt_index:
                if K[0, i, 0, 0] <= 0 or K[0, i, 1, 1] <= 0:
                    problems.append(
                        f"intrinsics[{i}] has non-positive focal length "
                        f"({K[0, i, 0, 0]:.3f}, {K[0, i, 1, 1]:.3f})"
                    )
    if problems:
        raise ValidationError("invalid batch:\n  " + "\n  ".join(problems))


def guard_predictions(predictions: Dict, raise_on_error: bool = False) -> List[str]:
    """Scan a prediction dict for NaN/Inf; returns (and optionally raises) the
    list of problems."""
    problems = []
    for key, value in predictions.items():
        if hasattr(value, "ndim"):
            msg = check_valid_array(np.asarray(value), key)
            if msg:
                problems.append(msg)
    if problems and raise_on_error:
        raise ValidationError("non-finite predictions:\n  " + "\n  ".join(problems))
    return problems


def qk_logit_bound(params, head_dim: int) -> float:
    """Worst-case |scaled attention score| across every qk-normed attention
    in a parameter pytree.

    After per-head-dim LayerNorm with weight g and bias b, each row y of
    q (or k) satisfies ||y||_2 <= sqrt(D) * max|g| + ||b||_2 <=
    sqrt(D) * (max|g| + max|b|), so
    |q . k| / sqrt(D) <= sqrt(D) * A_q * A_k, A = max|g| + max|b|.
    Stacked (per-layer-scanned) weights are reduced over all layers at once.

    Used at checkpoint load to certify the fixed-max flash softmax
    (config.bounded_attn_logits): the kernel clamps scores at 80, so any
    bound comfortably below that guarantees bit-clean softmax."""

    def amp(p):
        return float(np.abs(np.asarray(p["scale"])).max()) + float(
            np.abs(np.asarray(p["bias"])).max()
        )

    worst = 0.0

    def visit(node):
        nonlocal worst
        if isinstance(node, dict):
            if "q_norm" in node and "k_norm" in node:
                worst = max(worst, amp(node["q_norm"]) * amp(node["k_norm"]))
            for v in node.values():
                visit(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                visit(v)

    visit(params)
    return float(np.sqrt(head_dim)) * worst


def check_bounded_logits_safe(params, head_dim: int, limit: float = 40.0) -> bool:
    """True when the qk-norm logit bound stays under `limit` (half the flash
    kernel's saturation clamp — generous margin). Logs when it does not."""
    bound = qk_logit_bound(params, head_dim)
    if bound > limit:
        import logging

        logging.getLogger(__name__).warning(
            "qk-norm logit bound %.1f exceeds %.1f; disabling the fixed-max "
            "flash softmax (config.bounded_attn_logits=False) for this model",
            bound, limit,
        )
        return False
    return True
