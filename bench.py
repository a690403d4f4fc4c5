"""Benchmark: flagship OmniVGGT (ViT-L, 1.2B-param class) multi-view inference
throughput at 518 px, the BASELINE.json metric (views/sec/chip).

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline",          # S=8 headline
   "mfu",                                             # S=8 model FLOPs util
   "views_per_sec_s64", "mfu_s64"}                    # S=64 sweep point

MFU = analytic forward FLOPs (utils/profiling.flops_estimate) / wall-clock /
the v5e theoretical bf16 peak (197 TFLOPs). Large amortised matmuls measure
~175 TFLOPs achievable on this chip through the tunnel, so ~0.89 is the
practical MFU ceiling. (Round 1 used a 67-TFLOP "measured peak" that was
dispatch-bound — too low a denominator; recalibrated in round 2.)

Baseline: the reference repo publishes no numbers (BASELINE.md); the only
measurable reference in this environment is the PyTorch reference model on this
host's CPU. `bench_baseline.json` stores that one-time measurement
(views/sec, measured via tools/measure_torch_baseline.py); vs_baseline is
ours / reference. If the file is absent, vs_baseline is null.

Env knobs: BENCH_VIEWS (default 8) headline frame count, BENCH_ITERS (10),
BENCH_SWEEP=0 to skip the S=64 point, BENCH_HEAD_DTYPE=float32 /
BENCH_APPROX_GELU=0 to bench the reference-parity modes (the default is the
serving configuration: bf16 heads + tanh-GELU trunk, certified at checkpoint
load by certify_fast_modes), BENCH_COMPRESS=0 to keep fp32 trunk weight
storage (default: bf16-stored trunk weights, checkpoint.cast_trunk_params —
<= ~1e-5 output delta, +2% throughput), BENCH_TRUNK_QUANT=int8 to make the
headline itself the W8A8 trunk mode, BENCH_INT8_POINT=0 to skip the extra
int8 S=8 measurement that is otherwise reported as views_per_sec_int8,
BENCH_CERTIFY=1 to run the certification ladder on the random init and
bench what it picks instead of the hardwired modes.

The JSON's "modes" block records the exact serving modes the headline ran
with and their provenance (hardwired assumptions vs ladder-certified) —
the headline and the serving mechanism are otherwise different code paths.
Run-to-run variance through the TPU tunnel is ~±3% (r3: 19.32 driver run
vs 19.75/19.88 same-code builder runs); treat deltas inside that band as
noise, not regressions.
"""

import json
import os
import time

import numpy as np

# v5e theoretical bf16 peak; ~175e12 measured achievable via large
# amortised matmuls on this chip (dispatch-bound small measurements read 67)
ROOFLINE_FLOPS = 197e12


def _dispatch_modes():
    """Resolved kernel-dispatch knobs, recorded so the artifact identifies
    the code path it ran (the round-4 stream-kernel regression was invisible
    in BENCH_r04.json because the modes block only named quant/dtype modes).
    No dispatch-default change lands without a paired A/B in the commit."""
    from omnivggt_tpu.models import dpt_head
    from omnivggt_tpu.ops import attention, layers

    return {
        "packed_attn": attention._PACKED_ATTN,
        "stream_attn": attention._STREAM_ATTN,
        "flash_max_rows": attention._FLASH_MAX_ROWS,
        "xla_max_score_bytes": attention._XLA_MAX_SCORE_BYTES,
        "mismatch_flash": attention._MISMATCH_FLASH,
        "epilogue_barrier": layers._EPILOGUE_BARRIER,
        "qkv_barrier": layers._QKV_BARRIER,
        "s2d_head_convs": dpt_head._S2D_HEAD_CONVS,
        "pallas_head_convs": dpt_head._PALLAS_HEAD_CONVS,
    }


def _measure(fwd, params, cfg, S, H, W, iters):
    """Compile + time `iters` forwards; returns (views/sec, mfu)."""
    import jax.numpy as jnp

    from omnivggt_tpu.utils.profiling import flops_estimate

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(1, S, H, W, 3)).astype(np.float32))

    # warmup / compile; np.asarray forces a host transfer — on this backend
    # block_until_ready alone does not wait for execution
    np.asarray(fwd(params, images)[1])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, images)
    np.asarray(out[1])  # device executes in order; fetching the last result
    dt = time.perf_counter() - t0  # waits for the whole queue

    views_per_sec = S * iters / dt
    mfu = flops_estimate(cfg, S, H, W) * iters / dt / ROOFLINE_FLOPS
    return views_per_sec, mfu


def main():
    from omnivggt_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp

    from omnivggt_tpu.config import OmniVGGTConfig
    from omnivggt_tpu.models import omnivggt as M

    S = int(os.environ.get("BENCH_VIEWS", "8"))
    H = W = 518
    # serving default since round 3: bf16 trunk AND bf16 heads — checkpoint
    # load certifies the fast modes on a probe batch and falls back to
    # fp32 parity when the deltas exceed tolerance (models/omnivggt.py
    # certify_fast_modes). BENCH_HEAD_DTYPE=float32 benches the
    # reference-parity fp32-head mode.
    cfg = OmniVGGTConfig(
        head_dtype=os.environ.get("BENCH_HEAD_DTYPE", "bfloat16"),
        # certified trunk tanh-GELU (certify_fast_modes); =0 for exact erf
        approx_gelu=os.environ.get("BENCH_APPROX_GELU", "1") != "0",
        # BENCH_TRUNK_QUANT=int8 benches the W8A8 trunk serving mode
        # (2x-rate int8 MXU; certified per-checkpoint by certify_fast_modes)
        trunk_quant=os.environ.get("BENCH_TRUNK_QUANT", "none"),
        # int8-qk flash score matmuls (certified-by-default serving mode;
        # BENCH_ATTN_QUANT=none for the bf16 score path)
        attn_quant=os.environ.get("BENCH_ATTN_QUANT", "int8"),
        # BENCH_HEAD_QUANT=int8 benches W8A8 DPT-head convs (not a default:
        # tools/bench_int8_conv.py must first show int8 convs beat bf16
        # on this chip)
        head_quant=os.environ.get("BENCH_HEAD_QUANT", "none"),
    )

    params = jax.jit(lambda k: M.init(k, cfg))(jax.random.PRNGKey(0))
    if os.environ.get("BENCH_COMPRESS", "1") != "0":
        from omnivggt_tpu.checkpoint import cast_trunk_params

        params = cast_trunk_params(params)
    jax.block_until_ready(params)

    # provenance: by default the fast modes above are HARDWIRED benchmark
    # assumptions (BENCH_* env), not the output of the per-checkpoint
    # certification ladder — random-init weights may not pass the gates the
    # serving path enforces (random flagship init fails the 2e-2 pose gate
    # for the int8 trunk at ~6e-2). BENCH_CERTIFY=1 instead runs
    # certify_fast_modes on this init and benches what the ladder picks.
    provenance = "hardwired"
    if os.environ.get("BENCH_CERTIFY", "0") != "0":
        import dataclasses

        base = dataclasses.replace(
            cfg, head_dtype="float32", approx_gelu=False,
            trunk_quant="none", attn_quant="none", head_quant="none",
        )
        cfg = M.certify_fast_modes(params, base)
        provenance = "certified (certify_fast_modes on this random init)"

    @jax.jit
    def fwd(params, images):
        preds = M.apply(params, images, cfg)
        # tiny checksum output: forces full execution, cheap to fetch
        return (
            preds["pose_enc"],
            jnp.sum(preds["depth"]),
            jnp.sum(preds["world_points"]),
        )

    # 10 iters ≈ 4 s of measured device time at S=8 — short runs through the
    # tunnel scatter ±3%; 60-iter runs reproduce to ±0.1% (r4 barrier A/B/A)
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    views_per_sec, mfu = _measure(fwd, params, cfg, S, H, W, iters)

    result = {
        "metric": "views_per_sec_518px",
        "value": round(views_per_sec, 4),
        "unit": "views/sec/chip",
        "mfu": round(mfu, 4),
        # the exact serving modes this headline ran with, and whether they
        # came from the certification ladder or are benchmark assumptions
        "modes": {
            "head_dtype": cfg.head_dtype,
            "approx_gelu": cfg.approx_gelu,
            "trunk_quant": cfg.trunk_quant,
            "attn_quant": cfg.attn_quant,
            "head_quant": cfg.head_quant,
            "weights": "random-init",
            "provenance": provenance,
            "dispatch": _dispatch_modes(),
        },
    }

    if os.environ.get("BENCH_SWEEP", "1") != "0":
        vps64, mfu64 = _measure(fwd, params, cfg, 64, H, W, max(iters // 3, 1))
        result["views_per_sec_s64"] = round(vps64, 4)
        result["mfu_s64"] = round(mfu64, 4)

    # W8A8 trunk point (certified per-checkpoint by certify_fast_modes; the
    # headline stays the mode above because int8 certification depends on
    # the loaded weights — random flagship init measures pose deltas ~6e-2
    # vs the 2e-2 serving gate, so it cannot be claimed unconditionally)
    if os.environ.get("BENCH_INT8_POINT", "1") != "0" and cfg.trunk_quant == "none":
        import dataclasses

        # head_quant rides with the int8 trunk rung in the certification
        # ladder (neutral elsewhere, +1% here — see config.py), so the int8
        # point measures the pair the ladder actually serves
        cfg_q = dataclasses.replace(cfg, trunk_quant="int8", head_quant="int8")

        @jax.jit
        def fwd_q(params, images):
            preds = M.apply(params, images, cfg_q)
            return (
                preds["pose_enc"],
                jnp.sum(preds["depth"]),
                jnp.sum(preds["world_points"]),
            )

        vps_q, mfu_q = _measure(fwd_q, params, cfg_q, S, H, W, iters)
        result["views_per_sec_int8"] = round(vps_q, 4)
        result["mfu_int8"] = round(mfu_q, 4)

    # analytic allgather-vs-ring roofline for the 8-chip sequence-sharded
    # path (no multi-chip hardware here; these are the numbers a real v5e-8
    # run confirms or refutes — utils/profiling.sharded_attention_roofline)
    if os.environ.get("BENCH_ROOFLINE", "1") != "0":
        from omnivggt_tpu.utils.profiling import sharded_attention_roofline

        result["sharded_roofline"] = sharded_attention_roofline()

    vs_baseline = None
    base_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    # the stored torch baseline is an S=8 workload; per-view cost depends on
    # S (global attention is O(S^2)), so the ratio is only meaningful there
    if os.path.exists(base_path) and S == 8:
        with open(base_path) as f:
            base = json.load(f)
        if base.get("views_per_sec"):
            vs_baseline = views_per_sec / base["views_per_sec"]
    result["vs_baseline"] = round(vs_baseline, 2) if vs_baseline else None

    print(json.dumps(result))


if __name__ == "__main__":
    main()
