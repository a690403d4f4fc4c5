"""Quick start: reconstruct a scene folder and export a GLB.

    python examples/quickstart.py /path/to/scene/images [camera_folder] [ckpt]

Mirrors the reference README's Quick Start (library usage, SURVEY.md §3.5).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omnivggt_tpu.utils.platform import ensure_platform

ensure_platform()

import numpy as np  # noqa: E402

from omnivggt_tpu import OmniVGGT, load_images_and_cameras  # noqa: E402
from omnivggt_tpu.config import OmniVGGTConfig  # noqa: E402
from omnivggt_tpu.utils.geometry import (  # noqa: E402
    pose_encoding_to_extri_intri,
    unproject_depth_map_to_point_map,
)
from omnivggt_tpu.viz.glb import predictions_to_glb  # noqa: E402


def main():
    image_folder = sys.argv[1]
    camera_folder = sys.argv[2] if len(sys.argv) > 2 else None
    ckpt = sys.argv[3] if len(sys.argv) > 3 else None

    images, extrinsics, intrinsics, depths, masks, depth_idx, camera_idx = (
        load_images_and_cameras(image_folder, camera_folder=camera_folder)
    )

    model = (
        OmniVGGT.from_safetensors(ckpt) if ckpt else OmniVGGT(OmniVGGTConfig())
    )
    predictions = model(
        images,
        extrinsics=extrinsics, intrinsics=intrinsics,
        depth=depths, mask=masks,
        depth_gt_index=depth_idx, camera_gt_index=camera_idx,
    )

    H, W = images.shape[1:3]
    extrinsic, intrinsic = pose_encoding_to_extri_intri(
        predictions["pose_enc"], (H, W)
    )

    preds = {k: np.asarray(v)[0] for k, v in predictions.items()
             if k != "pose_enc_list" and hasattr(v, "ndim")}
    preds["extrinsic"] = np.asarray(extrinsic)[0]
    preds["intrinsic"] = np.asarray(intrinsic)[0]
    preds["world_points_from_depth"] = unproject_depth_map_to_point_map(
        preds["depth"], preds["extrinsic"], preds["intrinsic"]
    )
    out = predictions_to_glb(preds, "scene.glb", conf_thres=25.0)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
