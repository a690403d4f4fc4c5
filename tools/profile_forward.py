"""Capture a device trace of the flagship forward and print the top ops.

    python tools/profile_forward.py [S] [logdir]

Writes a TensorBoard/Perfetto trace via jax.profiler and prints the device-op
durations aggregated by name — the workflow used to find that the aggregator
scan, DINOv2 scan, and flash-attention kernel dominate the forward
(see CLAUDE.md perf facts).
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omnivggt_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def top_ops(logdir: str, n: int = 30):
    totals = collections.Counter()
    for fn in glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True):
        with gzip.open(fn, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                totals[ev.get("name", "")] += ev["dur"]
    return totals.most_common(n)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    logdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/omnivggt_trace"

    from omnivggt_tpu.config import OmniVGGTConfig
    from omnivggt_tpu.models import omnivggt as M

    # match bench.py's serving configuration: bf16 heads + tanh GELU +
    # int8-qk attention + bf16-stored trunk
    cfg = OmniVGGTConfig(
        head_dtype=os.environ.get("BENCH_HEAD_DTYPE", "bfloat16"),
        approx_gelu=os.environ.get("BENCH_APPROX_GELU", "1") != "0",
        trunk_quant=os.environ.get("BENCH_TRUNK_QUANT", "none"),
        attn_quant=os.environ.get("BENCH_ATTN_QUANT", "int8"),
    )
    params = jax.jit(lambda k: M.init(k, cfg))(jax.random.PRNGKey(0))
    if os.environ.get("BENCH_COMPRESS", "1") != "0":
        from omnivggt_tpu.checkpoint import cast_trunk_params

        params = cast_trunk_params(params)

    @jax.jit
    def fwd(params, images):
        p = M.apply(params, images, cfg)
        return p["pose_enc"], jnp.sum(p["depth"]), jnp.sum(p["world_points"])

    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, S, 518, 518, 3)).astype(np.float32)
    )
    np.asarray(fwd(params, images)[1])  # compile + warm

    jax.profiler.start_trace(logdir)
    np.asarray(fwd(params, images)[1])
    jax.profiler.stop_trace()

    print(f"trace in {logdir}; top device ops:")
    for name, dur in top_ops(logdir):
        print(f"{dur/1000:10.1f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
