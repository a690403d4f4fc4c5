"""End-to-end SERVING throughput on the real chip: flagship model behind
InferenceSession + Batcher (bucketed padding, cross-request batching), mixed
scene sizes, concurrent submitters — the number a deployment actually sees,
as opposed to bench.py's raw forward rate.

    python tools/bench_serving.py

Prints ONE JSON line:
  {"metric": "serving_views_per_sec", "value": ..., "scenes": ..., "views": ...}

Measured on this host: 1.65 views/s end-to-end (12 scenes, 4 threads) vs
19.7 raw forward — the gap is the TUNNELED host fetching every scene's full
prediction payload (depth + conf + world points + conf + images ~ 10 MB/view
fp32) back over the ~100 MB/s TPU tunnel plus single-core numpy
stack/convert work. On a directly-attached deployment host the device->host
copy runs at PCIe/DMA rates and this gap mostly disappears; re-run there
for a deployable number.

Env: BENCH_HEAD_DTYPE / BENCH_APPROX_GELU / BENCH_ATTN_QUANT /
BENCH_TRUNK_QUANT as in bench.py; SERVE_SCENES (default 12) 8-frame scenes
at 518 px (one compilation key — every distinct (frame count, batch size)
pair is its own flagship compile through the tunnel, so the default stays
uniform; the padded kv_valid path is covered by tests), SERVE_THREADS
(default 4) concurrent submitters.
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omnivggt_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import numpy as np  # noqa: E402


def main():
    import jax

    from omnivggt_tpu.config import OmniVGGTConfig
    from omnivggt_tpu.models.omnivggt import OmniVGGT
    from omnivggt_tpu.serving import Batcher, InferenceSession

    cfg = OmniVGGTConfig(
        head_dtype=os.environ.get("BENCH_HEAD_DTYPE", "bfloat16"),
        approx_gelu=os.environ.get("BENCH_APPROX_GELU", "1") != "0",
        trunk_quant=os.environ.get("BENCH_TRUNK_QUANT", "none"),
        attn_quant=os.environ.get("BENCH_ATTN_QUANT", "int8"),
    )
    model = OmniVGGT(cfg, seed=0)
    session = InferenceSession(model=model, compress_trunk=True)
    batcher = Batcher(session, max_batch=4)

    H = W = 518
    n_scenes = int(os.environ.get("SERVE_SCENES", "12"))
    n_threads = int(os.environ.get("SERVE_THREADS", "4"))
    rng = np.random.default_rng(0)
    scenes = [
        rng.uniform(size=(8, H, W, 3)).astype(np.float32)
        for _ in range(n_scenes)
    ]

    # warmup/compile every batch size the Batcher can form (each is its own
    # executable; the persistent cache makes re-runs fast)
    for b in range(1, 5):
        session.infer_batch([{"images": scenes[0]}] * b, max_batch=4)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        futures = [pool.submit(batcher.submit, images=im) for im in scenes]
        results = [f.result() for f in futures]
    dt = time.perf_counter() - t0
    batcher.close()

    views = sum(im.shape[0] for im in scenes)
    for r, im in zip(results, scenes):
        # per-scene outputs are unbatched: pose_enc is (S, 9)
        assert r["pose_enc"].shape[0] == im.shape[0], "padding not stripped"
        assert np.isfinite(r["pose_enc"]).all()

    out = {
        "metric": "serving_views_per_sec",
        "value": round(views / dt, 4),
        "unit": "views/sec/chip",
        "scenes": n_scenes,
        "views": views,
        "threads": n_threads,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
