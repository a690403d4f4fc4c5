"""Multi-device tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): sharded attention strategies and the
sharded full-model forward must match single-device results exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omnivggt_tpu.ops.attention import _attention_xla
from omnivggt_tpu.parallel import attention as pattn
from omnivggt_tpu.parallel.mesh import make_mesh, shard_batch
from omnivggt_tpu.parallel.sharding import ModelSharding

needs_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8dev
@pytest.mark.parametrize("strategy", ["allgather", "ring"])
def test_sequence_sharded_attention_matches_full(strategy):
    mesh = make_mesh(data=1, seq=8)
    rng = np.random.default_rng(0)
    B, N, H, D = 1, 8 * 37, 4, 32
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32)) for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    fn = pattn.allgather_attention if strategy == "allgather" else pattn.ring_attention
    kwargs = {"impl": "xla"} if strategy == "allgather" else {}
    out = np.asarray(fn(q, k, v, mesh, "seq", **kwargs))
    np.testing.assert_allclose(ref, out, atol=2e-5)


@needs_8dev
def test_rows_sharded_attention_matches_full():
    mesh = make_mesh(data=2, seq=4)
    rng = np.random.default_rng(1)
    R, N, H, D = 8, 21, 2, 16
    q, k, v = [
        jnp.asarray(rng.normal(size=(R, N, H, D)).astype(np.float32)) for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    out = np.asarray(
        pattn.rows_sharded_attention(q, k, v, mesh, ("data", "seq"), impl="xla")
    )
    np.testing.assert_allclose(ref, out, atol=2e-5)


@needs_8dev
def test_sharded_forward_with_modalities_matches_single_device():
    """Sharded forward with GT camera + depth injection == single device."""
    import jax.numpy as jnp_

    from omnivggt_tpu.config import tiny_test_config
    from omnivggt_tpu.models import omnivggt as M
    from omnivggt_tpu.models.omnivggt import make_aux
    from omnivggt_tpu.utils import geometry as G

    cfg = tiny_test_config()
    params = M.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    B, S, H, W = 1, 8, 28, 28
    images = jnp_.asarray(rng.uniform(size=(B, S, H, W, 3)).astype(np.float32))
    q = rng.normal(size=(B, S, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ex = np.zeros((B, S, 3, 4), np.float32)
    ex[..., :3] = np.asarray(G.quat_to_mat(jnp_.asarray(q)))
    ex[..., 3] = rng.normal(size=(B, S, 3))
    K = np.tile(np.diag([30.0, 30.0, 1.0]).astype(np.float32), (B, S, 1, 1))
    K[..., 0, 2] = K[..., 1, 2] = 14
    depth = rng.uniform(0.5, 5, size=(B, S, H, W, 1)).astype(np.float32)
    mask = np.ones((B, S, H, W), np.float32)
    aux = make_aux(S, ex, K, depth, mask, [0, 3], [0, 1, 5])

    ref = M.apply(params, images, cfg, aux)

    mesh = make_mesh(data=1, seq=8)
    sharding = ModelSharding(mesh, global_attn="ring")
    fwd = jax.jit(lambda p, im, a: M.apply(p, im, cfg, a, sharding=sharding))
    out = fwd(params, shard_batch(mesh, images), aux)
    np.testing.assert_allclose(
        np.asarray(ref["pose_enc"]), np.asarray(out["pose_enc"]), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref["depth"]), np.asarray(out["depth"]), atol=5e-5, rtol=1e-5
    )


@needs_8dev
@pytest.mark.parametrize("global_attn", ["allgather", "ring", "ring_fused"])
def test_sharded_model_forward_matches_single_device(global_attn):
    """Full tiny-model forward on a (1, 8) mesh == single-device forward.
    ring_fused routes the global-attention stage through the Pallas RDMA ring
    kernel (interpret mode on this CPU mesh; real RDMA on hardware)."""
    from omnivggt_tpu.config import tiny_test_config
    from omnivggt_tpu.models import omnivggt as M

    cfg = tiny_test_config()
    params = M.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.uniform(size=(1, 8, 28, 28, 3)).astype(np.float32))

    ref = M.apply(params, images, cfg)

    mesh = make_mesh(data=1, seq=8)
    sharding = ModelSharding(mesh, global_attn=global_attn)
    images_sharded = shard_batch(mesh, images)

    fwd = jax.jit(lambda p, im: M.apply(p, im, cfg, sharding=sharding))
    out = fwd(params, images_sharded)

    np.testing.assert_allclose(
        np.asarray(ref["pose_enc"]), np.asarray(out["pose_enc"]), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref["depth"]), np.asarray(out["depth"]), atol=5e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref["world_points"]), np.asarray(out["world_points"]),
        atol=5e-5, rtol=1e-5,
    )


@needs_8dev
def test_fused_ring_oversize_falls_back_logged(caplog):
    """Shards beyond the HBM ring kernel's cap fall back to the unfused
    ppermute ring with a warning (not silently, not with a crash)."""
    import logging

    from omnivggt_tpu.ops.pallas import ring_attention as RK

    mesh = make_mesh(data=1, seq=8)
    rng = np.random.default_rng(5)
    # tiny shapes but a temporarily tiny cap: exercise the dispatch logic
    B, N, H, D = 1, 8 * 16, 2, 16
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    ]
    old = RK.MAX_LOCAL_SEQ_HBM
    try:
        RK.MAX_LOCAL_SEQ_HBM = 8
        with caplog.at_level(logging.WARNING):
            out = pattn.fused_ring_attention(q, k, v, mesh, "seq")
    finally:
        RK.MAX_LOCAL_SEQ_HBM = old
    assert any("falling back to the unfused" in r.message for r in caplog.records)
    ref = np.asarray(_attention_xla(q, k, v))
    np.testing.assert_allclose(ref, np.asarray(out), atol=2e-5)


@needs_8dev
def test_sharded_int8_trunk_matches_single_device():
    """W8A8 trunk forward on the (1, 8) mesh == single-device W8A8 forward.
    The dynamic activation scales are per-row (last-axis max), so sequence
    sharding cannot change them; this pins that the quantised dense path
    composes with the sharded attention strategies."""
    import dataclasses

    from omnivggt_tpu.config import tiny_test_config
    from omnivggt_tpu.models import omnivggt as M

    cfg = dataclasses.replace(tiny_test_config(), trunk_quant="int8")
    params = M.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(size=(1, 8, 28, 28, 3)).astype(np.float32))

    ref = M.apply(params, images, cfg)

    mesh = make_mesh(data=1, seq=8)
    sharding = ModelSharding(mesh, global_attn="allgather")
    images_sharded = shard_batch(mesh, images)
    out = jax.jit(lambda p, im: M.apply(p, im, cfg, sharding=sharding))(
        params, images_sharded
    )

    np.testing.assert_allclose(
        np.asarray(ref["pose_enc"]), np.asarray(out["pose_enc"]), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref["depth"]), np.asarray(out["depth"]), atol=5e-5, rtol=1e-5
    )


@needs_8dev
def test_allgather_attention_qk_int8():
    """int8-qk flash under the allgather strategy (interpret-mode kernel):
    per-shard q scales keep the result at the 8-bit noise level of the
    exact attention. Packed dispatch is forced off: at this gathered key
    count the packed token-major kernel is eligible and takes precedence
    over qk_int8 (it is both faster and more accurate), which would turn
    this into a bf16 test."""
    import functools
    from unittest import mock

    import jax.experimental.pallas as pl

    import omnivggt_tpu.ops.attention as attn_mod

    mesh = make_mesh(data=1, seq=8)
    rng = np.random.default_rng(5)
    B, N, H, D = 1, 8 * 37, 2, 64
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    orig = pl.pallas_call
    # _sdpa_jit's trace cache is keyed on shapes/statics, not the module
    # flag — clear it so the patched dispatch actually retraces
    attn_mod._sdpa_jit.clear_cache()
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ), mock.patch.object(attn_mod, "_PACKED_ATTN", False):
        out = np.asarray(
            pattn.allgather_attention(
                q, k, v, mesh, "seq", impl="flash", bounded_logits=True,
                qk_int8=True,
            )
        )
    attn_mod._sdpa_jit.clear_cache()
    d = np.max(np.abs(out - ref))
    assert 0 < d < 2e-2, d


@needs_8dev
def test_allgather_qk_int8_pregather_exactness():
    """The pre-gather int8 K path (local shard quantised with pmax-global
    scales, gathered int8 — half the K bytes on ICI) must be BIT-IDENTICAL
    to gather-then-quantise: the pmax of the shard-local per-head max-abs
    IS the max-abs of the gathered array, so the int8 grid is the same.
    Packed dispatch is forced off (at this gathered key count it would
    supersede qk_int8 on both sides and vacate the comparison)."""
    import functools
    from unittest import mock

    import jax.experimental.pallas as pl
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    import omnivggt_tpu.ops.attention as attn_mod
    from omnivggt_tpu.ops.attention import scaled_dot_product_attention

    mesh = make_mesh(data=1, seq=8)
    rng = np.random.default_rng(7)
    B, N, H, D = 1, 8 * 37, 2, 64
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    ]

    # gather-then-quantise reference (the pre-pregather implementation)
    spec = P(None, "seq", None, None)

    def inner_old(q, k, v):
        k_full = jax.lax.all_gather(k, "seq", axis=1, tiled=True)
        v_full = jax.lax.all_gather(v, "seq", axis=1, tiled=True)
        return scaled_dot_product_attention(
            q, k_full, v_full, impl="flash", bounded_logits=True,
            qk_int8=True,
        )

    orig = pl.pallas_call
    attn_mod._sdpa_jit.clear_cache()
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ), mock.patch.object(attn_mod, "_PACKED_ATTN", False):
        old = np.asarray(
            shard_map(
                inner_old, mesh=mesh, in_specs=(spec, spec, spec),
                out_specs=spec, check_vma=False,
            )(q, k, v)
        )
        new = np.asarray(
            pattn.allgather_attention(
                q, k, v, mesh, "seq", impl="flash", bounded_logits=True,
                qk_int8=True,
            )
        )
    attn_mod._sdpa_jit.clear_cache()
    np.testing.assert_array_equal(new, old)


@needs_8dev
def test_allgather_stream_pregather_exactness():
    """Above the packed kernel's key budget (gathered keys > 2048, bounded)
    the int8 allgather strategy pre-gathers TOKEN-MAJOR int8 K for the
    streaming kernel: local shards quantised with pmax-global per-head
    scales must be BIT-IDENTICAL to gather-then-quantise (the single-device
    stream int8 dispatch), and both sit at int8 noise from exact
    attention."""
    import functools
    from unittest import mock

    import jax.experimental.pallas as pl

    from omnivggt_tpu.ops import attention as attn_mod
    from omnivggt_tpu.ops.attention import (
        scaled_dot_product_attention,
        stream_eligible,
    )

    mesh = make_mesh(data=1, seq=8)
    rng = np.random.default_rng(13)
    B, N, H, D = 1, 8 * 384, 2, 64  # gathered keys 3072 > _PACKED_MAX_KEYS
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32)) * 0.5
        for _ in range(3)
    ]

    orig = pl.pallas_call
    # the stream kernel is default-OFF (loses to head-major int8 on-chip,
    # round-5 measurement) — opt in for the duration of this parity test;
    # clear the jit cache on both sides so the dispatch re-resolves
    attn_mod._sdpa_jit.clear_cache()
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ), mock.patch.object(attn_mod, "_STREAM_ATTN", True):
        assert stream_eligible((B, N // 8, H, D), N, True)
        single = np.asarray(
            scaled_dot_product_attention(
                q, k, v, impl="flash", bounded_logits=True, qk_int8=True
            )
        )
        sharded = np.asarray(
            pattn.allgather_attention(
                q, k, v, mesh, "seq", impl="flash", bounded_logits=True,
                qk_int8=True,
            )
        )
    attn_mod._sdpa_jit.clear_cache()
    ref = np.asarray(_attention_xla(q, k, v))
    # int8-noise from exact attention on both paths...
    assert 0 < np.max(np.abs(single - ref)) < 2e-2
    assert 0 < np.max(np.abs(sharded - ref)) < 2e-2
    # ...and the K grids agree bit-exactly (pmax-global scales == gathered
    # scales); the only sharded-vs-single difference is the shard-local q
    # scales, whose effect stays inside the int8 noise band
    np.testing.assert_allclose(sharded, single, atol=2e-2)


@needs_8dev
def test_allgather_packed_eligible_matches_single_device():
    """Gathered key counts within the packed kernel's whole-K VMEM budget
    route the sharded allgather attention through the token-major packed
    kernel (local q shard, FULL gathered K — eligibility must be judged on
    the key length, not q's). qk_int8 is superseded consistently on both
    the sharded and single-device paths, so they agree to fp32 noise."""
    import functools
    from unittest import mock

    import jax.experimental.pallas as pl

    from omnivggt_tpu.ops.attention import scaled_dot_product_attention

    mesh = make_mesh(data=1, seq=8)
    rng = np.random.default_rng(11)
    B, N, H, D = 1, 8 * 37, 2, 64
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    ]

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        single = np.asarray(
            scaled_dot_product_attention(
                q, k, v, impl="flash", bounded_logits=True, qk_int8=True
            )
        )
        sharded = np.asarray(
            pattn.allgather_attention(
                q, k, v, mesh, "seq", impl="flash", bounded_logits=True,
                qk_int8=True,
            )
        )
    ref = np.asarray(_attention_xla(q, k, v))
    # both must be the PACKED result: bf16-free fp32 kernel noise vs the
    # exact attention, orders of magnitude below the int8 grid (~1e-2)
    assert np.max(np.abs(single - ref)) < 2e-5
    assert np.max(np.abs(sharded - ref)) < 2e-5


@needs_8dev
def test_allgather_qk_int8_padding_scale_isolation():
    """Bucketed-serving contract under sharding: garbage activations in the
    padded frames (rows >= kv_valid) must not perturb the real rows' int8
    quantisation scales — the shard-local q rows past the valid boundary
    are zeroed before quantisation."""
    import functools
    from unittest import mock

    import jax.experimental.pallas as pl

    mesh = make_mesh(data=1, seq=8)
    rng = np.random.default_rng(11)
    B, N, H, D = 1, 8 * 37, 2, 64
    nv = 200  # straddles shard 5 (rows 185..221)
    q, k, v = [
        rng.normal(size=(B, N, H, D)).astype(np.float32) for _ in range(3)
    ]
    # simulated padded-frame garbage: x1000 activations past the boundary
    q[:, nv:] *= 1000.0
    k[:, nv:] *= 1000.0
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)

    ref = np.asarray(_attention_xla(q, k, v, kv_valid=nv))[:, :nv]
    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        out = np.asarray(
            pattn.allgather_attention(
                q, k, v, mesh, "seq", impl="flash", kv_valid=nv,
                bounded_logits=True, qk_int8=True,
            )
        )[:, :nv]
    d = np.max(np.abs(out - ref))
    # without the q-zeroing (and the kv_valid scale masking for k), the
    # x1000 garbage inflates the per-head scales and this blows past 1.0
    assert 0 < d < 2e-2, d


def test_unfused_ring_suffices_beyond_hbm_cap():
    """Roofline-backed negative pin (round 4): past the HBM-staged fused
    ring's 28,672-token/device cap, the UNFUSED ppermute ring's per-step
    comm is hidden under per-step attention compute with >40x headroom, so
    a q-chunked fused extension has <2.5% to recover — the documented
    reason the cap is not lifted (ops/pallas/ring_attention.py, ROADMAP)."""
    from omnivggt_tpu.ops.pallas.ring_attention import (
        MAX_LOCAL_SEQ_HBM, fits_hbm_ring, hbm_ring_padded_len,
    )
    from omnivggt_tpu.utils.profiling import sharded_attention_roofline

    roof = sharded_attention_roofline(views=(64, 128, 167, 256))
    for v in (167, 256):
        layer = roof["per_layer"][v]
        # these view counts genuinely exceed the fused cap ...
        assert not layer["hbm_ring_ok"]
        assert not fits_hbm_ring(v * 1374 // 8)
        # ... and there the unfused ring still hides its comm entirely,
        # with the worst-case (zero-overlap) exposure under 2.5%
        assert layer["ring_comm_hidden"] and layer["ring_comm_hidden_int8"]
        assert layer["ring_step_comm_ms"] / layer["ring_step_attn_ms"] < 0.025
    # the north-star 128-view shape stays INSIDE the fused kernel's cap
    assert hbm_ring_padded_len(128 * 1374 // 8) <= MAX_LOCAL_SEQ_HBM
