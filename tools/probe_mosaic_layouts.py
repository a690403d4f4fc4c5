"""Mosaic layout-capability probes for the folded-conv kernel design.

Each probe compiles a tiny Pallas kernel exercising ONE layout-sensitive
primitive the conv3x3 kernel wants to use, and prints pass/fail. Run on the
real chip (interpret mode accepts everything, so it proves nothing):

    python tools/probe_mosaic_layouts.py

Findings drive which conv3x3_folded formulation is expressible — the first
two on-chip attempts died in Mosaic's layout inference:
  - "unsupported shape cast": (rb*w2,128) -> (rb,w2,2,2,cout) splits lanes
  - "result/input offset mismatch on non-concat dimension": lane-concat of
    phase slices at sublane/lane offsets {1,64}
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omnivggt_tpu.utils.platform import ensure_platform

ensure_platform()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# deliberately sublane-unaligned row count and small lane count, matching
# the conv shapes (w2=259, cin=64)
R, W2, C = 18, 24, 64  # slab rows (2rb+2 with rb=8), folded cols, channels


def _run(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
        )
        out = jax.jit(fn)(*args)
        np.asarray(out)
        print(f"  PASS {name}", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"  FAIL {name}: {msg}", flush=True)
        return False


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, W2, C)), jnp.bfloat16)
    x2 = jnp.asarray(rng.normal(size=(64, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(C, 128)), jnp.bfloat16)

    print("probe set (bf16, tile (16,128)):", flush=True)

    # 1. reshape splitting the MAJOR dim only (rows 2rb+2 -> (rb+1, 2)),
    #    sublanes/lanes intact
    def k_major_split(x_ref, o_ref):
        xr = x_ref[:].reshape(R // 2, 2, W2, C)
        o_ref[:] = xr[:, 0] + xr[:, 1]

    _run("reshape major split (2rb+2,w2,c)->(rb+1,2,w2,c)",
         k_major_split, (R // 2, W2, C), x)

    # 2. reshape merging major dim INTO 16-aligned sublanes:
    #    (rb, 32, c) -> (rb*32, c)
    def k_major_merge(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(16 * 32, C)

    x_al = jnp.asarray(rng.normal(size=(16, 32, C)), jnp.bfloat16)
    _run("reshape major merge (rb,32,c)->(rb*32,c) [16-aligned sublanes]",
         k_major_merge, (16 * 32, C), x_al)

    # 2b. same with UNALIGNED sublane dim (w2=24 not mult of 16 is aligned
    #     to 8 only; use 27)
    def k_major_merge_u(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(16 * 27, C)

    x_un = jnp.asarray(rng.normal(size=(16, 27, C)), jnp.bfloat16)
    _run("reshape major merge (rb,27,c)->(rb*27,c) [unaligned sublanes]",
         k_major_merge_u, (16 * 27, C), x_un)

    # 3. lane concat of TWO MAJOR-OFFSET slices (offsets {0,0} both):
    #    slices differing only in the leading (major) index
    def k_concat_major(x_ref, o_ref):
        xr = x_ref[:].reshape(R // 2, 2, W2, C)
        a = xr[0 : R // 2 - 1, 0]
        b = xr[1 : R // 2, 0]
        o_ref[:] = jnp.concatenate([a, b], axis=-1)

    _run("lane concat of major-shifted slices",
         k_concat_major, (R // 2 - 1, W2, 2 * C), x)

    # 4. lane concat of SUBLANE-offset slices (offset {1,0} operand)
    def k_concat_sublane(x_ref, o_ref):
        a = x_ref[:, 0 : W2 - 1, :]
        b = x_ref[:, 1:W2, :]
        o_ref[:] = jnp.concatenate([a, b], axis=-1)

    _run("lane concat of sublane-offset slices",
         k_concat_sublane, (R, W2 - 1, 2 * C), x)

    # 5. matmul with a sublane-offset LHS (no concat)
    def k_mm_offset(x_ref, w_ref, o_ref):
        a = x_ref[:, 1:W2, :].reshape((W2 - 1) * R, C)
        o_ref[:] = jax.lax.dot_general(
            a, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    _run("matmul w/ sublane-offset LHS (incl. unaligned merge)",
         k_mm_offset, (R * (W2 - 1), 128), x, w)

    # 6. pltpu.roll on sublanes (to normalise offsets instead of slicing)
    def k_roll(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 1, 1)

    _run("pltpu.roll along sublane dim", k_roll, (R, W2, C), x)

    # 7. strided MAJOR slice (rows ty::2)
    def k_strided(x_ref, o_ref):
        o_ref[:] = x_ref[:][0::2]

    _run("strided major slice x[0::2]", k_strided, (R // 2, W2, C), x)

    # 8. strided SUBLANE load from ref (phase split without reshape)
    def k_strided_sub(x_ref, o_ref):
        o_ref[:] = x_ref[:][:, 0::2, :]

    _run("strided sublane slice x[:,0::2]", k_strided_sub, (R, W2 // 2, C), x)

    # 9. lane concat of interleaved-lane slices (the ORIGINAL failure):
    #    reshape (.., 2, 64) puts sx in lanes; slicing sx=1 -> lane offset 64
    def k_concat_lane_off(x_ref, o_ref):
        xr = x_ref[:].reshape(R, W2 // 2, 2, C)
        o_ref[:] = jnp.concatenate([xr[:, :, 0, :], xr[:, :, 1, :]], axis=-1)

    _run("lane concat of lane-interleaved slices (known-bad repro)",
         k_concat_lane_off, (R, W2 // 2, 2 * C), x)

    # 10. 2D matmul then direct store, sanity
    def k_mm(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    _run("sanity 2D matmul", k_mm, (64, 128), x2, w)


if __name__ == "__main__":
    main()
