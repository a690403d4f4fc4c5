"""TPU-vs-CPU model-forward cross-check.

The parity suite runs on CPU (XLA/blockwise attention); the real TPU chip
runs the Pallas flash kernels (fold-sum + bounded-logits paths) that
interpret-mode tests only approximate. This tool runs the SAME model and
inputs through both backends in separate processes (the axon platform
cannot co-host the CPU backend) at a shape large enough to engage the flash
kernel (N = 32*32+5 = 1029 >= the 1024 dispatch threshold) and compares.

    python tools/validate_tpu.py            # orchestrates both runs
    python tools/validate_tpu.py cpu|tpu    # (internal) one backend

Expected agreement: ~5e-4 absolute on dense maps, ~5e-3 relative on pose —
bf16-trunk reduction-order noise. Larger deltas indicate a kernel bug.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = "/tmp/omnivggt_validate_{mode}.npz"
REL_TOL = 2e-2  # an order of magnitude above the expected bf16 noise


def run_one(mode: str):
    if mode == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    else:
        from omnivggt_tpu.utils.platform import ensure_platform

        ensure_platform()

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from omnivggt_tpu.config import tiny_test_config
    from omnivggt_tpu.models import omnivggt as M

    cfg = dataclasses.replace(tiny_test_config(), img_size=448)
    S, H, W = 2, 448, 448
    params = M.init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, S, H, W, 3)).astype(np.float32)
    )
    preds = jax.jit(lambda p, x: M.apply(p, x, cfg))(params, imgs)
    out = {k: np.asarray(v, np.float32) for k, v in preds.items()
           if hasattr(v, "ndim")}

    # gradient path: the fused Pallas flash backward (dq/dkv kernels) only
    # runs on real TPU — cross-check a full-model input gradient too
    def loss(p, x):
        pr = M.apply(p, x, cfg)
        return (
            jnp.sum(pr["pose_enc"].astype(jnp.float32) ** 2)
            + jnp.mean(pr["depth"].astype(jnp.float32) ** 2)
        )

    g = jax.jit(jax.grad(loss, argnums=1))(params, imgs)
    out["grad_images"] = np.asarray(g, np.float32)
    np.savez(OUT.format(mode=mode), **out)
    print(f"{mode}: {jax.devices()}")


def compare() -> int:
    import numpy as np

    a = np.load(OUT.format(mode="tpu"))
    b = np.load(OUT.format(mode="cpu"))
    worst = 0.0
    for k in b.files:
        d = float(np.abs(a[k] - b[k]).max())
        rel = d / (float(np.abs(b[k]).max()) + 1e-9)
        ok = np.isfinite(a[k]).all() and rel < REL_TOL
        print(f"{k:20s} maxabs={d:.3e}  rel={rel:.3e}  {'ok' if ok else 'FAIL'}")
        worst = max(worst, rel)
        if not ok:
            return 1
    print(f"TPU/CPU forward consistency OK (worst rel {worst:.2e})")
    return 0


def main():
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
        return
    here = os.path.abspath(__file__)
    for mode in ("tpu", "cpu"):
        subprocess.run([sys.executable, here, mode], check=True)
    sys.exit(compare())


if __name__ == "__main__":
    main()
