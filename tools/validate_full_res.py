"""Certified full-resolution flagship parity: torch reference vs JAX at 518 px.

Runs the REAL OmniVGGT architecture (ViT-L/14 DINOv2 embedder, 24+24
aggregator blocks, 2048-d heads, ~1.2B params) with converted random weights
at the production 518 px resolution (37x37 patch grid, 1374-token RoPE
tables, full-res DPT upsampling) on S>=2 frames with camera+depth GT
injection — the exact path tests/test_full_size_parity.py covers at 140 px.

Takes a while on one CPU core (two 1.2B forwards); writes the recorded
max-abs deltas to PARITY_518.json at the repo root and exits non-zero if any
gate fails. Gates match the 140 px test (pose 2e-3, depth 2e-3, points 5e-3).

Usage:  python tools/validate_full_res.py [--frames 2] [--out PARITY_518.json]
"""

import argparse
import gc
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATES = {"pose_enc": 2e-3, "depth": 2e-3, "world_points": 5e-3}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_518.json"))
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    from tests.reference_util import install_reference, torch_state_dict_to_numpy

    install_reference()
    import torch

    torch.manual_seed(0)

    from omnivggt.models.omnivggt import OmniVGGT as TorchOmniVGGT

    B, S, H, W = 1, args.frames, args.size, args.size
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(B, S, 3, H, W)).astype(np.float32)

    from tests.test_models import _aux_tensors

    ex, K, depth, mask = _aux_tensors(torch, B, S, H, W, seed=1)
    depth_idx, camera_idx = [1], list(range(S))

    print(f"[1/3] torch reference forward at {H}px, S={S} ...", flush=True)
    t0 = time.time()
    with torch.no_grad():
        model_t = TorchOmniVGGT().eval()
        preds_t = model_t(
            torch.from_numpy(images),
            torch.from_numpy(ex), torch.from_numpy(K),
            torch.from_numpy(depth), torch.from_numpy(mask),
            depth_gt_index=depth_idx, camera_gt_index=camera_idx,
        )
    ref = {k: preds_t[k].numpy() for k in ("pose_enc", "depth", "world_points")}
    sd = torch_state_dict_to_numpy(model_t)
    del model_t, preds_t
    gc.collect()
    torch_s = time.time() - t0
    print(f"      done in {torch_s:.0f}s", flush=True)

    print("[2/3] converting weights ...", flush=True)
    from omnivggt_tpu import config as C
    from omnivggt_tpu.checkpoint import convert_state_dict

    cfg = C.OmniVGGTConfig(compute_dtype="float32")
    params = convert_state_dict(sd, cfg)
    del sd
    gc.collect()

    print(f"[3/3] JAX forward at {H}px, S={S} ...", flush=True)
    from omnivggt_tpu.models import omnivggt as M
    from omnivggt_tpu.models.omnivggt import make_aux

    t0 = time.time()
    aux = make_aux(S, ex, K, depth, mask, depth_idx, camera_idx)
    preds_j = M.apply(
        params, jnp.asarray(images.transpose(0, 1, 3, 4, 2)), cfg, aux
    )
    ours = {k: np.asarray(preds_j[k]) for k in GATES}
    jax_s = time.time() - t0
    print(f"      done in {jax_s:.0f}s", flush=True)

    result = {
        "config": {"frames": S, "size": H, "weights": "converted torch random init",
                   "modalities": {"camera_gt_index": camera_idx, "depth_gt_index": depth_idx}},
        "gates": GATES,
        "max_abs_diff": {},
        "torch_forward_s": round(torch_s, 1),
        "jax_forward_s": round(jax_s, 1),
    }
    ok = True
    for k, gate in GATES.items():
        d = float(np.max(np.abs(ref[k] - ours[k])))
        result["max_abs_diff"][k] = d
        status = "PASS" if d <= gate else "FAIL"
        ok &= d <= gate
        print(f"  {k}: max |delta| = {d:.3e}  (gate {gate:g})  {status}")
    result["pass"] = ok

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
