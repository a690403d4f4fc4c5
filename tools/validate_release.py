"""One-command real-checkpoint release validation.

Given the released `OmniVGGT.safetensors` (the file this zero-egress image
cannot fetch — /root/reference/inference.py:322-325, README.md:63), this
driver produces the BASELINE.json gate numbers with zero improvisation:

  1. converts + loads the checkpoint (tools/convert_checkpoint's mapping via
     OmniVGGT.from_safetensors), certifying the bounded-logits flash softmax
     AND the bf16-head default on probe batches (models/omnivggt.py);
  2. runs example/office (images + cameras) and example/infinigen (images +
     cameras + depths) through the production loader + forward;
  3. loads the SAME weights into the PyTorch reference and computes goldens
     on identical preprocessed inputs;
  4. reports pose AUC@30 of JAX-vs-torch camera trajectories, depth abs-rel,
     and max pose_enc delta, gated at the BASELINE.json 1e-3 parity target,
     plus measured views/sec on the current backend;
  5. writes everything to RELEASE_VALIDATION.json, exit code 0/1.

Usage:
  python tools/validate_release.py checkpoints/OmniVGGT.safetensors
  python tools/validate_release.py ckpt.safetensors --frames 4  # bound runtime
  (tested end-to-end with converted random weights via --arch tiny)
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

PARITY_GATE = 1e-3  # BASELINE.json: pose AUC / depth abs-rel within 1e-3


def _scene_specs(example_root):
    return [
        {
            "name": "office",
            "image_folder": os.path.join(example_root, "office", "images"),
            "camera_folder": os.path.join(example_root, "office", "cameras"),
            "depth_folder": None,
        },
        {
            "name": "infinigen",
            "image_folder": os.path.join(example_root, "infinigen", "images"),
            "camera_folder": os.path.join(example_root, "infinigen", "cameras"),
            "depth_folder": os.path.join(example_root, "infinigen", "depths"),
        },
    ]


def _torch_goldens(arch, safetensors_path, scenes, cfg):
    """Load the same weights into the PyTorch reference and run it on the
    already-preprocessed inputs of each scene. Returns per-scene goldens."""
    from tests.reference_util import install_reference

    install_reference()
    import torch

    if arch == "tiny":
        from tests.test_models import _tiny_torch_omnivggt

        torch.manual_seed(0)
        model_t = _tiny_torch_omnivggt(torch)
    else:
        from omnivggt.models.omnivggt import OmniVGGT as TorchOmniVGGT

        with torch.no_grad():
            model_t = TorchOmniVGGT()
    from safetensors.numpy import load_file

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in load_file(safetensors_path).items()}
    model_t.load_state_dict(sd, strict=True)  # mirrors inference.py:324
    model_t.eval()
    del sd
    gc.collect()

    goldens = {}
    for sc in scenes:
        images, ex, K, depth, mask, d_idx, c_idx = sc["batch"]
        with torch.no_grad():
            preds = model_t(
                torch.from_numpy(images.transpose(0, 3, 1, 2)[None]),
                torch.from_numpy(ex), torch.from_numpy(K),
                torch.from_numpy(depth), torch.from_numpy(mask),
                depth_gt_index=d_idx, camera_gt_index=c_idx,
            )
        goldens[sc["name"]] = {
            "pose_enc": preds["pose_enc"].numpy(),
            "depth": preds["depth"].numpy(),
        }
        del preds
        gc.collect()
    del model_t
    gc.collect()
    return goldens


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("safetensors", help="path to the released OmniVGGT.safetensors")
    ap.add_argument("--example_root", default="/root/reference/example")
    ap.add_argument("--frames", type=int, default=None,
                    help="cap frames per scene (bounds the torch CPU runtime)")
    ap.add_argument("--target_size", type=int, default=518)
    ap.add_argument("--arch", choices=["flagship", "tiny"], default="flagship",
                    help="tiny = self-test mode with the tiny architecture")
    ap.add_argument("--out", default=os.path.join(REPO, "RELEASE_VALIDATION.json"))
    ap.add_argument("--skip_torch", action="store_true",
                    help="skip torch goldens (structure/throughput check only)")
    args = ap.parse_args(argv)

    from omnivggt_tpu.utils.platform import ensure_platform

    ensure_platform()
    import jax

    from omnivggt_tpu.data.loader import load_images_and_cameras
    from omnivggt_tpu.eval.trajectory import pose_auc
    from omnivggt_tpu.models.omnivggt import OmniVGGT
    from omnivggt_tpu.utils.geometry import (
        closed_form_inverse_se3,
        pose_encoding_to_extri_intri,
    )

    result = {"checkpoint": os.path.abspath(args.safetensors),
              "arch": args.arch, "gate": PARITY_GATE, "scenes": {}}

    # ---- 1. convert + certify -------------------------------------------
    print(f"[1/4] loading + certifying {args.safetensors} ...", flush=True)
    if args.arch == "tiny":
        # self-test architecture matching tests/test_models' tiny torch model
        from tests.test_models import _tiny_cfg

        cfg = _tiny_cfg()
    else:
        cfg = None
    model = OmniVGGT.from_safetensors(args.safetensors, cfg)
    result["certified"] = {
        "bounded_attn_logits": model.config.bounded_attn_logits,
        "head_dtype": model.config.head_dtype,
        "approx_gelu": model.config.approx_gelu,
        "trunk_quant": model.config.trunk_quant,
        "attn_quant": model.config.attn_quant,
    }
    print(f"      bounded_attn_logits={model.config.bounded_attn_logits} "
          f"head_dtype={model.config.head_dtype} "
          f"approx_gelu={model.config.approx_gelu} "
          f"trunk_quant={model.config.trunk_quant} "
          f"attn_quant={model.config.attn_quant}", flush=True)
    # the 1e-3 torch-parity gate is defined on the reference-parity mode
    # (fp32 heads, omnivggt.py:45); the certified bf16-head serving default
    # trades ~1e-2 pose_enc deltas for throughput and is benched separately
    import dataclasses

    parity_model = OmniVGGT(
        dataclasses.replace(
            model.config, head_dtype="float32", approx_gelu=False,
            trunk_quant="none", attn_quant="none",
        ),
        model.params,
    )

    # ---- 2. load scenes + JAX forwards ----------------------------------
    target = model.config.img_size if args.arch == "tiny" else args.target_size
    scenes = []
    for spec in _scene_specs(args.example_root):
        batch = load_images_and_cameras(
            spec["image_folder"],
            camera_folder=spec["camera_folder"],
            depth_folder=spec["depth_folder"],
            target_size=target,
        )
        if args.frames:
            images, ex, K, depth, mask, d_idx, c_idx = batch
            n = args.frames
            batch = (images[:n], ex[:, :n], K[:, :n], depth[:, :n],
                     mask[:, :n], [i for i in d_idx if i < n],
                     [i for i in c_idx if i < n])
        scenes.append({**spec, "batch": batch})

    ours = {}
    for sc in scenes:
        images, ex, K, depth, mask, d_idx, c_idx = sc["batch"]
        S, H, W = images.shape[:3]
        print(f"[2/4] JAX forward: {sc['name']} S={S} @ {H}x{W} ...", flush=True)
        t0 = time.perf_counter()
        preds = model(images, extrinsics=ex, intrinsics=K, depth=depth,
                      mask=mask, depth_gt_index=d_idx, camera_gt_index=c_idx)
        np.asarray(preds["pose_enc"])  # forces execution
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        preds = model(images, extrinsics=ex, intrinsics=K, depth=depth,
                      mask=mask, depth_gt_index=d_idx, camera_gt_index=c_idx)
        np.asarray(preds["pose_enc"])
        run_s = time.perf_counter() - t0
        # parity outputs in the reference-parity fp32-heads mode
        ppreds = parity_model(
            images, extrinsics=ex, intrinsics=K, depth=depth,
            mask=mask, depth_gt_index=d_idx, camera_gt_index=c_idx,
        )
        ours[sc["name"]] = {
            "pose_enc": np.asarray(ppreds["pose_enc"]),
            "depth": np.asarray(ppreds["depth"]),
            "views_per_sec": S / run_s,
        }
        result["scenes"][sc["name"]] = {
            "frames": S, "size": [H, W],
            "views_per_sec": round(S / run_s, 3),
            "compile_plus_run_s": round(compile_s, 1),
        }
        print(f"      {S / run_s:.2f} views/s", flush=True)

    # ---- 3+4. torch goldens + parity metrics ----------------------------
    ok = True
    if args.skip_torch:
        result["parity"] = "skipped (--skip_torch)"
    else:
        print("[3/4] torch reference goldens (same weights) ...", flush=True)
        goldens = _torch_goldens(args.arch, args.safetensors, scenes, model.config)
        print("[4/4] parity metrics ...", flush=True)
        for sc in scenes:
            name = sc["name"]
            H, W = sc["batch"][0].shape[1:3]
            g, o = goldens[name], ours[name]

            pe_delta = float(np.max(np.abs(g["pose_enc"] - o["pose_enc"])))
            # decoded trajectories -> pose AUC@30 of ours against the golden
            exg = pose_encoding_to_extri_intri(g["pose_enc"], (H, W))[0][0]
            exo = pose_encoding_to_extri_intri(o["pose_enc"], (H, W))[0][0]

            def c2w(e34):
                e = np.tile(np.eye(4, dtype=np.float64), (len(e34), 1, 1))
                e[:, :3, :4] = e34
                return np.asarray(closed_form_inverse_se3(e))

            auc = pose_auc(c2w(exo), c2w(exg), thresholds=(30,))["auc@30"]
            abs_rel = float(
                np.mean(np.abs(o["depth"] - g["depth"]) / np.maximum(g["depth"], 1e-3))
            )
            gates = {
                "pose_auc@30_deficit": (1.0 - auc, PARITY_GATE),
                "depth_abs_rel": (abs_rel, PARITY_GATE),
            }
            scene_ok = all(v <= tol for v, tol in gates.values())
            ok &= scene_ok
            result["scenes"][name].update({
                "pose_auc@30": auc,
                "depth_abs_rel": abs_rel,
                "pose_enc_max_abs_delta": pe_delta,
                "pass": scene_ok,
            })
            print(f"  {name}: AUC@30={auc:.6f} abs-rel={abs_rel:.2e} "
                  f"pose_enc d={pe_delta:.2e} -> "
                  f"{'PASS' if scene_ok else 'FAIL'}", flush=True)

    result["pass"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
