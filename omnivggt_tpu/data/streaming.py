"""Sharded streaming input pipeline for multi-host training.

SceneDataset (data/dataset.py) loads and preprocesses whole scenes in-process
— right for a handful of scenes, wrong for production-scale corpora where
preprocessing is done once offline and training hosts stream samples. This
module is the webdataset-style answer, stdlib-only:

  - `write_shards`: serialize an iterator of sample dicts (any str->ndarray
    mapping, e.g. SceneDataset.sample outputs) into numbered tar shards of
    .npz members. Preprocess once, train many times.
  - `ShardedSampleStream`: each host streams the shards assigned to it
    (round-robin by host rank over the shard list — the standard multi-host
    partition, so hosts never read each other's bytes), decodes .npz members,
    and mixes them through a bounded shuffle buffer. Infinite epochs with
    per-epoch shard reshuffling; deterministic under a seed.
  - `batch_stream`: stacks consecutive samples into batches along a new
    leading axis and hands them to `dataset.prefetch` for host/device
    overlap.

The reference has no input pipeline at all (training code unreleased,
README.md:201-205); this is the framework-side subsystem scaled past the
single-process SceneDataset.
"""

from __future__ import annotations

import glob
import io
import os
import tarfile
from typing import Dict, Iterable, Iterator, List, Optional

import numpy as np


def write_shards(
    samples: Iterable[Dict[str, np.ndarray]],
    out_dir: str,
    samples_per_shard: int = 256,
    prefix: str = "shard",
) -> List[str]:
    """Write samples into `{out_dir}/{prefix}-{i:06d}.tar` files of .npz
    members. Returns the shard paths.

    Samples destined for `batch_stream` must use the SceneDataset layout:
    multi-axis arrays carry a leading batch dim of 1 ((1, S, H, W, 3)
    images, (1, S, 3, 4) extrinsics — S=1 scenes are (1, 1, ...)), per-frame
    masks are 1-D (S,). batch_stream strips exactly that leading 1; arrays
    in other layouts whose first dim happens to be 1 would lose a real axis."""
    os.makedirs(out_dir, exist_ok=True)
    paths: List[str] = []
    tar = None
    count = 0

    def open_next() -> tarfile.TarFile:
        path = os.path.join(out_dir, f"{prefix}-{len(paths):06d}.tar")
        paths.append(path)
        return tarfile.open(path, "w")

    try:
        for i, sample in enumerate(samples):
            if tar is None or count >= samples_per_shard:
                if tar is not None:
                    tar.close()
                tar = open_next()
                count = 0
            buf = io.BytesIO()
            np.savez(buf, **sample)
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"sample-{i:09d}.npz")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
            count += 1
    finally:
        if tar is not None:
            tar.close()
    return paths


class ShardedSampleStream:
    """Iterate samples from tar shards, partitioned across hosts.

    Args:
        pattern: glob for the shard files (e.g. "shards/shard-*.tar").
        shard_rank / num_shards: this host's partition (defaults to
            jax.process_index()/process_count() when jax is initialised,
            else 0/1). Shards are assigned round-robin AFTER the per-epoch
            shuffle, so every host sees a different, changing subset while
            the union covers everything.
        shuffle_buffer: size of the in-memory mixing buffer (0 = in-order).
        shuffle_shards: reshuffle the shard order every epoch (independent of
            the sample-level buffer; defaults on — turn off for deterministic
            in-order eval sweeps).
        seed: base seed; epoch index is folded in for reshuffling.
        repeat: loop forever (training) or stop after one pass (eval).
    """

    def __init__(
        self,
        pattern: str,
        shard_rank: Optional[int] = None,
        num_shards: Optional[int] = None,
        shuffle_buffer: int = 0,
        shuffle_shards: bool = True,
        seed: int = 0,
        repeat: bool = True,
    ):
        self.paths = sorted(glob.glob(pattern))
        if not self.paths:
            raise ValueError(f"no shards match {pattern!r}")
        if shard_rank is None or num_shards is None:
            shard_rank, num_shards = _default_partition()
        if not 0 <= shard_rank < num_shards:
            raise ValueError(f"shard_rank {shard_rank} not in [0,{num_shards})")
        self.rank = shard_rank
        self.world = num_shards
        self.shuffle_buffer = shuffle_buffer
        self.shuffle_shards = shuffle_shards
        self.seed = seed
        self.repeat = repeat

    def _epoch_paths(self, epoch: int) -> List[str]:
        order = np.arange(len(self.paths))
        if self.shuffle_shards:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        mine = order[self.rank :: self.world]
        if len(mine) == 0:
            # fewer shards than hosts: wrap so every host has input
            mine = order[[self.rank % len(order)]]
        return [self.paths[i] for i in mine]

    def _read_shard(self, path: str) -> Iterator[Dict[str, np.ndarray]]:
        with tarfile.open(path, "r") as tar:
            for member in tar:
                if not member.isfile() or not member.name.endswith(".npz"):
                    continue
                f = tar.extractfile(member)
                if f is None:
                    continue
                with np.load(io.BytesIO(f.read()), allow_pickle=False) as z:
                    yield {k: z[k] for k in z.files}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = 0
        while True:
            rng = np.random.default_rng((self.seed, self.rank, epoch))
            buf: List[Dict[str, np.ndarray]] = []
            for path in self._epoch_paths(epoch):
                for sample in self._read_shard(path):
                    if self.shuffle_buffer <= 1:
                        yield sample
                        continue
                    buf.append(sample)
                    if len(buf) >= self.shuffle_buffer:
                        j = int(rng.integers(len(buf)))
                        buf[j], buf[-1] = buf[-1], buf[j]
                        yield buf.pop()
            while buf:
                j = int(rng.integers(len(buf)))
                buf[j], buf[-1] = buf[-1], buf[j]
                yield buf.pop()
            if not self.repeat:
                return
            epoch += 1


def batch_stream(
    stream: Iterable[Dict[str, np.ndarray]],
    batch_size: int,
    prefetch_depth: int = 2,
) -> Iterator[Dict[str, np.ndarray]]:
    """Stack `batch_size` same-shaped samples along a new leading axis and
    prefetch batches on a background thread. Samples must use the
    SceneDataset layout (see write_shards): the leading batch dim of 1 on
    multi-axis arrays is squeezed before stacking. Mixed resolutions/
    view-counts are grouped by shape (one executable per bucket, same
    policy as serving) — a straggler bucket is flushed as a smaller final
    batch when the stream ends.

    Multi-host caveat: shape-bucketed emission is per-host; hosts streaming
    different shards can yield differently-shaped batches at the same step,
    which a synchronized SPMD train step cannot consume. For synchronized
    multi-host training, preprocess to ONE shape (fixed views_per_sample +
    target_size) so every batch matches; bucketing is for single-host runs
    or independent per-host step loops."""
    from omnivggt_tpu.data.dataset import prefetch

    def squeeze(g, k):
        x = g[k]
        # only multi-axis arrays carry a (1, S, ...) batch dim to strip;
        # squeezing 1-D per-frame masks would corrupt single-view samples
        # (camera_mask (1,) must stack to (B, 1), not (B,))
        return x[0] if (x.ndim >= 2 and x.shape[0] == 1) else x

    def stack(group):
        return {k: np.stack([squeeze(g, k) for g in group]) for k in group[0]}

    def batches():
        buckets: Dict[tuple, list] = {}
        for sample in stream:
            key = tuple(sorted(
                (k, v.shape, str(v.dtype)) for k, v in sample.items()
            ))
            group = buckets.setdefault(key, [])
            group.append(sample)
            if len(group) >= batch_size:
                yield stack(group)
                buckets[key] = []
        for group in buckets.values():
            if group:
                yield stack(group)

    return prefetch(batches(), depth=prefetch_depth)


def _default_partition():
    """(process_index, process_count) if a jax backend is ALREADY live,
    else (0, 1). Never initialises the backend: a data-loading class must
    not grab the TPU (or freeze the device count) as a side effect."""
    import sys

    jax = sys.modules.get("jax")
    if jax is None:
        return 0, 1
    try:
        from jax._src import xla_bridge

        if not xla_bridge.backends_are_initialized():
            return 0, 1
        return jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover — private-API drift
        return 0, 1
