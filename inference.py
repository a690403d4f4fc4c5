"""OmniVGGT-TPU inference CLI.

Mirrors the reference entry point (/root/reference/inference.py:280-420):
load a scene folder (images + optional per-frame camera .txt / depth .npy|.png),
run one jit-compiled forward pass, decode camera poses, optionally export a GLB,
and serve an interactive 3D viewer (a built-in WebGL page replaces viser).

Examples:
    python inference.py --image_folder example/office/images \
        --camera_folder example/office/cameras --save_glb
    python inference.py --image_folder scene/images --use_point_map --port 8080
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="OmniVGGT-TPU multi-view 3D reconstruction")
    p.add_argument("--image_folder", type=str, required=True, help="folder of input images")
    p.add_argument("--depth_folder", type=str, default=None, help="optional per-frame depth (.npy/.png)")
    p.add_argument("--camera_folder", type=str, default=None, help="optional per-frame camera .txt files")
    p.add_argument("--target_size", type=int, default=518, help="resize width in px")
    p.add_argument("--use_point_map", action="store_true",
                   help="visualize the point-map head output instead of depth unprojection")
    p.add_argument("--mask_sky", action="store_true", help="mask sky in the GLB export")
    p.add_argument("--mask_black_bg", action="store_true")
    p.add_argument("--mask_white_bg", action="store_true")
    p.add_argument("--conf_threshold", type=float, default=25.0,
                   help="confidence percentile filter")
    p.add_argument("--port", type=int, default=8080, help="viewer port")
    p.add_argument("--background_mode", action="store_true",
                   help="run the viewer in a daemon thread")
    p.add_argument("--save_glb", action="store_true", help="export scene .glb")
    p.add_argument("--glb_path", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="path to a converted reference safetensors checkpoint")
    p.add_argument("--no_viewer", action="store_true", help="skip the interactive viewer")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight config (CPU smoke testing)")
    p.add_argument("--compress_trunk", action="store_true",
                   help="store trunk weights in bf16 (~half the HBM, "
                        "<= ~1e-5 output delta; checkpoint.cast_trunk_params)")
    p.add_argument("--fp32_heads", action="store_true",
                   help="force the reference-parity modes (fp32 dense heads, "
                        "exact-erf GELU) instead of the certified fast modes")
    p.add_argument("--no_int8_trunk", action="store_true",
                   help="drop the W8A8 int8 trunk rung from the certified "
                        "fast modes (keep bf16 heads / tanh GELU if certified)")
    p.add_argument("--no_attn_quant", action="store_true",
                   help="drop the int8-qk attention-score quantisation from "
                        "the certified fast modes")
    return p.parse_args()


def main():
    args = parse_args()
    if args.target_size % 14:
        raise SystemExit(
            f"--target_size must be a multiple of the 14-px patch "
            f"(got {args.target_size}; nearest: "
            f"{round(args.target_size / 14) * 14})"
        )

    from omnivggt_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax

    from omnivggt_tpu import OmniVGGT
    from omnivggt_tpu.config import OmniVGGTConfig, tiny_test_config
    from omnivggt_tpu.data.loader import load_images_and_cameras
    from omnivggt_tpu.utils.geometry import (
        pose_encoding_to_extri_intri,
        unproject_depth_map_to_point_map,
    )

    print(f"devices: {jax.devices()}")

    if args.tiny:
        model = OmniVGGT(tiny_test_config())
    elif args.checkpoint:
        print(f"loading checkpoint {args.checkpoint} ...")
        model = OmniVGGT.from_safetensors(
            args.checkpoint,
            head_dtype="float32" if args.fp32_heads else "auto",
        )
        overrides = {}
        if args.no_int8_trunk and model.config.trunk_quant != "none":
            overrides["trunk_quant"] = "none"
        if args.no_attn_quant and model.config.attn_quant != "none":
            overrides["attn_quant"] = "none"
        if overrides:
            import dataclasses

            model = OmniVGGT(
                dataclasses.replace(model.config, **overrides), model.params
            )
        print(f"head dtype: {model.config.head_dtype}  "
              f"approx_gelu: {model.config.approx_gelu}  "
              f"trunk_quant: {model.config.trunk_quant}  "
              f"attn_quant: {model.config.attn_quant}")
    else:
        print(
            "WARNING: no --checkpoint given — running with random weights "
            "(outputs are structurally valid but not meaningful)."
        )
        model = OmniVGGT(OmniVGGTConfig())

    if args.compress_trunk:
        from omnivggt_tpu.checkpoint import cast_trunk_params

        model = OmniVGGT(model.config, cast_trunk_params(model.params))

    images, extrinsics, intrinsics, depths, masks, depth_idx, camera_idx = (
        load_images_and_cameras(
            args.image_folder,
            camera_folder=args.camera_folder,
            depth_folder=args.depth_folder,
            target_size=args.target_size,
        )
    )
    if args.tiny:
        # tiny config wants tiny images: stride-subsample to its img_size
        sz = model.config.img_size
        step = max(images.shape[1] // sz, 1)
        images = images[:, ::step, ::step][:, :sz, :sz]
        depths = depths[:, :, ::step, ::step][:, :, :sz, :sz]
        masks = masks[:, :, ::step, ::step][:, :, :sz, :sz]
    S, H, W = images.shape[:3]
    print(f"running inference on {S} frames at {H}x{W} ...")

    predictions = model(
        images,
        extrinsics=extrinsics,
        intrinsics=intrinsics,
        depth=depths,
        mask=masks,
        depth_gt_index=depth_idx,
        camera_gt_index=camera_idx,
    )

    extrinsic, intrinsic = pose_encoding_to_extri_intri(
        predictions["pose_enc"], (H, W)
    )

    preds = {
        k: np.asarray(v)[0]
        for k, v in predictions.items()
        if k != "pose_enc_list" and hasattr(v, "ndim")
    }
    preds["extrinsic"] = np.asarray(extrinsic)[0]
    preds["intrinsic"] = np.asarray(intrinsic)[0]
    preds["world_points_from_depth"] = unproject_depth_map_to_point_map(
        preds["depth"], preds["extrinsic"], preds["intrinsic"]
    )

    if args.save_glb:
        from omnivggt_tpu.viz.glb import predictions_to_glb

        glb_path = args.glb_path or os.path.join(
            os.path.dirname(args.image_folder.rstrip("/")) or ".", "scene.glb"
        )
        predictions_to_glb(
            preds,
            glb_path,
            conf_thres=args.conf_threshold,
            mask_black_bg=args.mask_black_bg,
            mask_white_bg=args.mask_white_bg,
            mask_sky=args.mask_sky,
            image_folder=args.image_folder,
            target_dir=os.path.dirname(glb_path) or ".",
            prediction_mode="Predicted Pointmap" if args.use_point_map else "Depth",
        )
        print(f"saved {glb_path}")

    if not args.no_viewer:
        from omnivggt_tpu.viz.server import serve_scene

        serve_scene(
            preds,
            port=args.port,
            init_conf_threshold=args.conf_threshold,
            background_mode=args.background_mode,
            use_point_map=args.use_point_map,
            mask_black_bg=args.mask_black_bg,
            mask_white_bg=args.mask_white_bg,
        )


if __name__ == "__main__":
    main()
