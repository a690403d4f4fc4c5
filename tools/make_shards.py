"""Build streaming training shards from scene folders.

Preprocess once, train many times: samples are drawn from a SceneDataset
(example-layout / ScanNet / CO3D roots all supported via the format
dispatcher) and serialized into tar shards that tools/train.py --shards
streams per host (data/streaming.py).

    python tools/make_shards.py --data_root scenes/ --out shards/ \
        --num_samples 10000 --views 4 [--target_size 518]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# pure host-side preprocessing: pin the CPU backend so sample building (the
# jax-based depth unprojection) never grabs the single tunneled TPU chip
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from omnivggt_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num_samples", type=int, required=True)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--target_size", type=int, default=518)
    ap.add_argument("--samples_per_shard", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from omnivggt_tpu.data.dataset import SceneDataset
    from omnivggt_tpu.data.streaming import write_shards

    ds = SceneDataset(
        args.data_root, views_per_sample=args.views,
        target_size=args.target_size, seed=args.seed,
    )
    print(f"{len(ds)} scene(s) under {args.data_root}")
    rng = np.random.default_rng(args.seed)

    def samples():
        for i in range(args.num_samples):
            if i and i % 100 == 0:
                print(f"  {i}/{args.num_samples}")
            yield ds.sample(rng)

    paths = write_shards(
        samples(), args.out, samples_per_shard=args.samples_per_shard
    )
    print(f"wrote {args.num_samples} samples into {len(paths)} shard(s) "
          f"under {args.out}")


if __name__ == "__main__":
    main()
