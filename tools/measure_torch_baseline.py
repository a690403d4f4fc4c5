"""One-time measurement of the PyTorch reference model's inference throughput
on this host, producing bench_baseline.json for bench.py's vs_baseline ratio.

The reference repo publishes no numbers (BASELINE.md) and its CUDA environment
is unavailable here, so the only measurable reference is the reference model
itself (random weights — throughput does not depend on weight values) running
on this host's CPU via its own PyTorch implementation. The workload matches
bench.py: S views at 518x518, full forward (aggregator + camera + depth +
point heads).

Usage: python tools/measure_torch_baseline.py [S] [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from reference_util import install_reference  # noqa: E402

install_reference()

import torch  # noqa: E402


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from omnivggt.models.omnivggt import OmniVGGT

    torch.manual_seed(0)
    with torch.no_grad():
        model = OmniVGGT().eval()

    H = W = 518
    images = torch.rand(1, S, 3, H, W)
    dummy_depth = torch.zeros(1, S, H, W, 1)
    dummy_mask = torch.zeros(1, S, H, W)
    dummy_ex = torch.zeros(1, S, 3, 4)
    dummy_K = torch.zeros(1, S, 3, 3)

    def run():
        with torch.no_grad():
            return model(
                images, dummy_ex, dummy_K, dummy_depth, dummy_mask,
                depth_gt_index=[], camera_gt_index=[],
            )

    t0 = time.perf_counter()
    run()  # warmup
    warm = time.perf_counter() - t0
    print(f"warmup: {warm:.1f}s")

    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    views_per_sec = S / dt

    out = {
        "views_per_sec": views_per_sec,
        "workload": f"S={S} @ {H}x{W}, full forward",
        "implementation": "PyTorch reference (/root/reference), this host's CPU",
        "torch_threads": torch.get_num_threads(),
        "note": (
            "reference publishes no benchmark numbers and its CUDA env is "
            "unavailable; this is the measurable reference baseline on "
            "identical hardware-neutral workload"
        ),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
