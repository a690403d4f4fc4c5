"""Image / camera / depth folder loading and preprocessing (host side).

Parity with the reference's live loader
(/root/reference/visual_util.py:517-891) and quick-start loader
(/root/reference/omnivggt/utils/load_fn.py:12-146):

  - images sorted, png/jpg/jpeg; RGBA composited onto white; PIL bicubic resize
    to width 518 with height rounded to a multiple of 14; centre-crop height to
    <= 518.
  - depth from `{basename}.npy` (non-finite -> 0) or `{basename}.png`
    (transposed, as the reference does, visual_util.py:771-773); values
    > max_depth or < 1e-5 zeroed; nearest-neighbour resize; same centre crop.
  - camera `{basename}.txt` = 3 rows of a 3x4 camera-to-world matrix + 3 rows
    of a 3x3 intrinsics matrix; intrinsics rescaled by the resize factors, cy
    shifted by the crop; extrinsic inverted c2w -> w2c.
  - frames lacking camera/depth get zero placeholders; the *_indices lists name
    the frames that do have ground truth.

Preprocessing stays on the host (PIL/OpenCV/numpy) for bit-parity with the
reference; outputs are channels-last numpy ready for the jit-compiled model:
images (S, H, W, 3) float32 in [0, 1].
"""

from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

TARGET_SIZE = 518
PATCH = 14


def _load_rgb(path: str) -> Image.Image:
    img = Image.open(path)
    if img.mode == "RGBA":
        background = Image.new("RGBA", img.size, (255, 255, 255, 255))
        img = Image.alpha_composite(background, img)
    return img.convert("RGB")


def load_camera_from_txt(camera_path: str):
    """3x4 camera-to-world extrinsic + 3x3 intrinsic from a text file
    (visual_util.py:843-891). Returns (None, None) on malformed files."""
    try:
        with open(camera_path) as f:
            lines = [
                l.strip()
                for l in f.readlines()
                if l.strip() and not l.strip().startswith("#")
            ]
        if len(lines) < 6:
            return None, None
        extrinsic = np.array(
            [[float(x) for x in lines[i].split()] for i in range(3)], np.float32
        )
        intrinsic = np.array(
            [[float(x) for x in lines[i].split()] for i in range(3, 6)], np.float32
        )
        if extrinsic.shape != (3, 4) or intrinsic.shape != (3, 3):
            return None, None
        return extrinsic, intrinsic
    except (ValueError, OSError):
        return None, None


def _invert_c2w(extrinsic_c2w: np.ndarray) -> np.ndarray:
    R = extrinsic_c2w[:3, :3]
    t = extrinsic_c2w[:3, 3]
    Rt = R.T
    return np.concatenate([Rt, (-Rt @ t)[:, None]], axis=1).astype(np.float32)


def _load_depth(depth_folder: str, basename: str, max_depth: float):
    import cv2

    for ext in (".npy", ".png"):
        path = os.path.join(depth_folder, basename + ext)
        if not os.path.exists(path):
            continue
        if ext == ".npy":
            depthmap = np.load(path).astype(np.float32)
            depthmap[~np.isfinite(depthmap)] = 0
        else:
            depthmap = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float32)
            depthmap = depthmap.T  # reference quirk (visual_util.py:772)
            depthmap = np.nan_to_num(depthmap, nan=0.0)
        depthmap[depthmap > max_depth] = 0
        depthmap[depthmap < 1e-5] = 0
        return depthmap
    return None


def load_images_and_cameras(
    image_folder: str,
    camera_folder: Optional[str] = None,
    depth_folder: Optional[str] = None,
    target_size: int = TARGET_SIZE,
    max_depth: float = 100.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[int], List[int]]:
    """Load a scene folder. Returns channels-last numpy:
    images (S, H, W, 3); extrinsics (1, S, 3, 4) w2c; intrinsics (1, S, 3, 3);
    depthmaps (1, S, H, W, 1); masks (1, S, H, W); depth_indices; camera_indices.
    """

    image_paths = sorted(glob.glob(os.path.join(image_folder, "*")))
    image_paths = [p for p in image_paths if p.lower().endswith((".png", ".jpg", ".jpeg"))]
    if not image_paths:
        raise ValueError(
            f"no .png/.jpg/.jpeg images found under {image_folder!r}"
        )

    imgs, extrinsics_l, intrinsics_l, depths_l, masks_l = [], [], [], [], []
    depth_indices: List[int] = []
    camera_indices: List[int] = []

    from omnivggt_tpu.data.cropping import resize_image_depth_and_intrinsic

    for idx, img_path in enumerate(image_paths):
        basename = Path(img_path).stem
        img = _load_rgb(img_path)

        depthmap = (
            _load_depth(depth_folder, basename, max_depth)
            if depth_folder is not None
            else None
        )
        has_depth = depthmap is not None

        extrinsic = intrinsic = None
        if camera_folder is not None:
            cam_path = os.path.join(camera_folder, f"{basename}.txt")
            if os.path.exists(cam_path):
                extrinsic, intrinsic = load_camera_from_txt(cam_path)
        has_camera = extrinsic is not None and intrinsic is not None

        # one canonical geometry op for image + depth + intrinsics
        img, depthmap, intrinsic = resize_image_depth_and_intrinsic(
            img, depthmap, intrinsic if has_camera else None,
            target_size=target_size, patch=PATCH,
        )
        arr = np.asarray(img, np.float32) / 255.0  # (H, W, 3)
        imgs.append(arr)

        if has_depth:
            depth_indices.append(idx)
            mask = depthmap > 1e-5
        else:
            depthmap = np.zeros(arr.shape[:2], np.float32)
            mask = np.zeros_like(depthmap, bool)
        depths_l.append(depthmap)
        masks_l.append(mask)

        if has_camera:
            camera_indices.append(idx)
            extrinsic = _invert_c2w(extrinsic)
        else:
            extrinsic = np.zeros((3, 4), np.float32)
            intrinsic = np.zeros((3, 3), np.float32)
        extrinsics_l.append(extrinsic)
        intrinsics_l.append(intrinsic)

    images = np.stack(imgs)
    depthmaps = np.stack(depths_l)[None, ..., None].astype(np.float32)
    masks = np.stack(masks_l)[None].astype(np.float32)
    extrinsics = np.stack(extrinsics_l)[None].astype(np.float32)
    intrinsics = np.stack(intrinsics_l)[None].astype(np.float32)
    return images, extrinsics, intrinsics, depthmaps, masks, depth_indices, camera_indices


def load_and_preprocess_images(image_path_list: List[str], mode: str = "crop") -> np.ndarray:
    """Quick-start loader (load_fn.py:12-146). Returns (N, H, W, 3) float32 in
    [0, 1]; mixed shapes padded with white to the max shape."""
    if len(image_path_list) == 0:
        raise ValueError("At least 1 image is required")
    if mode not in ("crop", "pad"):
        raise ValueError("Mode must be either 'crop' or 'pad'")

    target_size = TARGET_SIZE
    images = []
    shapes = set()
    for image_path in sorted(image_path_list):
        img = _load_rgb(image_path)
        width, height = img.size
        if mode == "pad":
            if width >= height:
                new_width = target_size
                new_height = round(height * (new_width / width) / PATCH) * PATCH
            else:
                new_height = target_size
                new_width = round(width * (new_height / height) / PATCH) * PATCH
        else:
            new_width = target_size
            new_height = round(height * (new_width / width) / PATCH) * PATCH

        # NOTE: this resize/round math intentionally duplicates neither
        # cropping.resize_image_depth_and_intrinsic (the visual_util.py
        # folder-loader geometry) nor vice versa — the reference ships TWO
        # loaders with different height rounding (load_fn.py:12-146 uses
        # round(), visual_util.py:731-747 floors+crops) and each is pinned
        # by its own parity test.
        img = img.resize((new_width, new_height), Image.Resampling.BICUBIC)
        arr = np.asarray(img, np.float32) / 255.0

        if mode == "crop" and new_height > target_size:
            start_y = (new_height - target_size) // 2
            arr = arr[start_y : start_y + target_size]
        if mode == "pad":
            h_pad = target_size - arr.shape[0]
            w_pad = target_size - arr.shape[1]
            if h_pad > 0 or w_pad > 0:
                arr = np.pad(
                    arr,
                    (
                        (h_pad // 2, h_pad - h_pad // 2),
                        (w_pad // 2, w_pad - w_pad // 2),
                        (0, 0),
                    ),
                    constant_values=1.0,
                )
        shapes.add(arr.shape[:2])
        images.append(arr)

    if len(shapes) > 1:
        max_h = max(s[0] for s in shapes)
        max_w = max(s[1] for s in shapes)
        images = [
            np.pad(
                a,
                (
                    ((max_h - a.shape[0]) // 2, max_h - a.shape[0] - (max_h - a.shape[0]) // 2),
                    ((max_w - a.shape[1]) // 2, max_w - a.shape[1] - (max_w - a.shape[1]) // 2),
                    (0, 0),
                ),
                constant_values=1.0,
            )
            for a in images
        ]
    return np.stack(images)
