"""Training dataset pipeline: scene folders -> model-ready batches.

The reference ships only dead training boilerplate (SURVEY.md §2.4); this is
the working pipeline that feeds `train.step.make_train_step`:

  - `SceneDataset`: a directory of scenes (each with images/ [cameras/]
    [depths/], the reference example layout). Loads and preprocesses each
    scene once through the canonical loader, derives ground-truth world points
    by unprojecting GT depth with GT cameras, and caches the arrays.
  - View selection: training samples draw S views around a random anchor using
    the pairwise camera-distance ranking (data/view_selection.py), the
    standard near-view sampling strategy for multi-view training.
  - Modality-dropout masks: each sample randomly keeps camera/depth GT for a
    subset of frames (the ZeroAggregator's training signal — the model must
    work for any GT subset).
  - Optional photometric augmentation (data/augmentation.py, pure-JAX rng).
  - `prefetch()`: a one-deep background-thread iterator so host-side loading
    overlaps device steps.

Everything is host-side numpy until the batch dict; the train step jits the
rest.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional

import numpy as np


class SceneDataset:
    def __init__(
        self,
        root: str,
        views_per_sample: int = 4,
        target_size: int = 518,
        camera_keep_prob: float = 0.5,
        depth_keep_prob: float = 0.5,
        augment=None,
        seed: int = 0,
    ):
        from omnivggt_tpu.data.loader import load_images_and_cameras

        self.views_per_sample = views_per_sample
        self.camera_keep_prob = camera_keep_prob
        self.depth_keep_prob = depth_keep_prob
        self.augment = augment
        self._rng = np.random.default_rng(seed)
        self._load = lambda sc: load_images_and_cameras(
            os.path.join(sc, "images"),
            camera_folder=self._opt(sc, "cameras"),
            depth_folder=self._opt(sc, "depths"),
            target_size=target_size,
        )

        self.scene_dirs: List[str] = sorted(
            os.path.join(root, d)
            for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d, "images"))
        )
        if os.path.isdir(os.path.join(root, "images")):
            self.scene_dirs.insert(0, root)  # root itself is a scene
        if not self.scene_dirs:
            raise ValueError(f"no scene folders with images/ under {root}")
        self._cache = {}

    @staticmethod
    def _opt(scene: str, sub: str) -> Optional[str]:
        p = os.path.join(scene, sub)
        return p if os.path.isdir(p) else None

    def _scene(self, idx: int):
        if idx not in self._cache:
            from omnivggt_tpu.data.view_selection import compute_ranking

            images, ex, K, depths, masks, d_idx, c_idx = self._load(
                self.scene_dirs[idx]
            )
            ranking = None
            if len(c_idx) == images.shape[0] and images.shape[0] > 1:
                E = np.tile(np.eye(4, dtype=np.float32), (images.shape[0], 1, 1))
                E[:, :3] = ex[0]
                ranking, _ = compute_ranking(E)
            self._cache[idx] = (images, ex, K, depths, masks, d_idx, c_idx, ranking)
        return self._cache[idx]

    def __len__(self):
        return len(self.scene_dirs)

    def sample(self, rng: Optional[np.random.Generator] = None) -> dict:
        """One training sample: S views of one scene with GT + dropout masks."""
        rng = rng or self._rng
        images, ex, K, depths, masks, d_idx, c_idx, ranking = self._scene(
            int(rng.integers(len(self.scene_dirs)))
        )
        n = images.shape[0]
        S = min(self.views_per_sample, n)

        anchor = int(rng.integers(n))
        if ranking is not None:
            # anchor + its nearest views (skip self at rank 0), lightly shuffled
            pool = ranking[anchor][: max(2 * S, S + 1)]
            pool = [v for v in pool if v != anchor]
            rng.shuffle(pool)
            views = np.asarray([anchor] + pool[: S - 1])
        else:
            views = rng.permutation(n)[:S]

        from omnivggt_tpu.utils.geometry import unproject_depth_map_to_point_map

        imgs = images[views]  # (S, H, W, 3)
        exv, Kv = ex[0][views], K[0][views]
        depthv, maskv = depths[0][views], masks[0][views]

        have_cam = np.isin(views, c_idx)
        have_depth = np.isin(views, d_idx)
        world_points = np.zeros(imgs.shape[:3] + (3,), np.float32)
        valid = np.zeros(imgs.shape[:3], np.float32)
        usable = have_cam & have_depth
        if usable.any():
            wp = unproject_depth_map_to_point_map(
                depthv[usable], exv[usable], Kv[usable]
            )
            world_points[usable] = wp
            valid[usable] = maskv[usable] * (depthv[usable, ..., 0] > 1e-5)

        cam_mask = have_cam & (rng.uniform(size=S) < self.camera_keep_prob)
        depth_mask = have_depth & (rng.uniform(size=S) < self.depth_keep_prob)
        if cam_mask.any() and not cam_mask[0] and have_cam[0]:
            cam_mask[0] = True  # the reference requires GT on the first frame
            # when any frame has it (README.md:176)

        if self.augment is not None:
            import jax

            key = jax.random.PRNGKey(int(rng.integers(2**31)))
            keys = jax.random.split(key, S)
            imgs = np.stack(
                [np.asarray(self.augment(k, im)) for k, im in zip(keys, imgs)]
            )

        return {
            "images": imgs[None],
            "extrinsics": exv[None],
            "intrinsics": Kv[None],
            "depth": depthv[None],
            "depth_valid": valid[None],
            "world_points": world_points[None],
            "camera_mask": cam_mask,
            "depth_mask": depth_mask,
        }

    def batches(self, n_steps: Optional[int] = None) -> Iterator[dict]:
        step = 0
        while n_steps is None or step < n_steps:
            yield self.sample()
            step += 1


def prefetch(iterator: Iterator[dict], depth: int = 2) -> Iterator[dict]:
    """Run `iterator` in a background thread with a bounded queue so host-side
    loading overlaps device execution."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
