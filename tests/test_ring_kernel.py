"""Fused RDMA ring flash-attention kernel, validated in Pallas TPU interpret
mode on the 8-device CPU mesh (the same code path lowers to real inter-chip
RDMA on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import numpy as _np
from jax.sharding import Mesh

from omnivggt_tpu.ops.attention import _attention_xla
from omnivggt_tpu.ops.pallas.ring_attention import ring_flash_attention

needs_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _seq_mesh():
    # interpret-mode remote DMA supports one manual axis; the kernels are
    # manual over the seq axis only, so multi-axis meshes also work (see
    # test_parallel.py::test_sharded_model_forward ring_fused case)
    return Mesh(_np.asarray(jax.devices()[:8]), ("seq",))


@needs_8dev
@pytest.mark.parametrize("B,N,H,D", [(1, 8 * 256, 2, 64), (2, 8 * 128, 4, 64)])
def test_ring_flash_attention_matches_full(B, N, H, D):
    mesh = _seq_mesh()
    rng = np.random.default_rng(0)
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    out = np.asarray(
        ring_flash_attention(q, k, v, mesh, "seq", block_q=128, block_k=128,
                             interpret=True)
    )
    np.testing.assert_allclose(ref, out, atol=2e-5)


@needs_8dev
def test_ring_flash_attention_multi_chunk():
    """Shards longer than the state chunk run the ring once per q chunk."""
    mesh = _seq_mesh()
    rng = np.random.default_rng(1)
    B, N, H, D = 1, 8 * 512, 1, 64
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    out = np.asarray(
        ring_flash_attention(
            q, k, v, mesh, "seq", block_q=128, block_k=256, chunk_q=256,
            interpret=True,
        )
    )
    np.testing.assert_allclose(ref, out, atol=2e-5)


@needs_8dev
@pytest.mark.parametrize("ragged", [False, True])
def test_ring_flash_attention_bounded_logits(ragged):
    """Bounded mode (fixed-max softmax, no running-max carry) is exact on
    qk-norm-scale inputs — both the VMEM kernel (divisible shard) and the
    HBM-staged kernel (ragged shard)."""
    mesh = _seq_mesh()
    rng = np.random.default_rng(5)
    B, H, D = 1, 2, 64
    nl = 300 if ragged else 256
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, 8 * nl, H, D)).astype(np.float32))
        for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    out = np.asarray(
        ring_flash_attention(
            q, k, v, mesh, "seq", block_q=128, block_k=128, interpret=True,
            bounded_logits=True,
        )
    )
    np.testing.assert_allclose(ref, out, atol=2e-5)


@needs_8dev
def test_unfused_ring_bounded_logits():
    from omnivggt_tpu.parallel import attention as pattn

    mesh = _seq_mesh()
    rng = np.random.default_rng(6)
    q, k, v = [
        jnp.asarray(rng.normal(size=(1, 8 * 64, 2, 64)).astype(np.float32))
        for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    out = np.asarray(
        pattn.ring_attention(q, k, v, mesh, "seq", bounded_logits=True)
    )
    np.testing.assert_allclose(ref, out, atol=2e-5)


@needs_8dev
def test_ring_flash_attention_rejects_oversize():
    mesh = _seq_mesh()
    q = jnp.zeros((1, 8 * 40960, 2, 64), jnp.float32)
    with pytest.raises(ValueError, match="HBM-staged cap"):
        ring_flash_attention(q, q, q, mesh, "seq", interpret=True)


@needs_8dev
def test_ring_hbm_ragged_shard():
    """Ragged per-device shards (not divisible by any block) dispatch to the
    HBM-staged kernel, which pads + masks internally; exact vs full attn."""
    mesh = _seq_mesh()
    rng = np.random.default_rng(3)
    B, H, D = 1, 2, 64
    nl = 300  # pads to 384 with blocks 128 — exercises per-shard key masking
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, 8 * nl, H, D)).astype(np.float32))
        for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    out = np.asarray(
        ring_flash_attention(
            q, k, v, mesh, "seq", block_q=128, block_k=128, interpret=True
        )
    )
    np.testing.assert_allclose(ref, out, atol=2e-5)


@needs_8dev
@pytest.mark.slow
def test_ring_hbm_north_star_shape():
    """The BASELINE config-4 shape the VMEM kernel refused: 128 views on 8
    chips -> 21,984 tokens/device. Run on a 2-device ring (interpret-mode
    compute at 8 devices is prohibitive; the per-device shard length — the
    quantity the cap is about — is the real one). Exact vs the unfused
    ppermute ring."""
    from omnivggt_tpu.parallel.attention import ring_attention as ring_unfused
    from omnivggt_tpu.ops.pallas.ring_attention import MAX_LOCAL_SEQ

    mesh = Mesh(_np.asarray(jax.devices()[:2]), ("seq",))
    nl = 21984
    assert nl > MAX_LOCAL_SEQ  # over the round-1 cap
    rng = np.random.default_rng(4)
    B, H, D = 1, 1, 64
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, 2 * nl, H, D)).astype(np.float32))
        for _ in range(3)
    ]
    out = np.asarray(
        ring_flash_attention(q, k, v, mesh, "seq", interpret=True)
    )
    ref = np.asarray(ring_unfused(q, k, v, mesh, "seq"))
    np.testing.assert_allclose(ref, out, atol=2e-5, rtol=1e-5)


@needs_8dev
@pytest.mark.parametrize("bounded", [True, False])
def test_ring_flash_attention_qk_int8(bounded):
    """W8A8 ring (VMEM variant): int8 KV shards with ring-global per-head
    scales stay at the 8-bit noise level of exact attention."""
    mesh = _seq_mesh()
    rng = np.random.default_rng(7)
    B, N, H, D = 1, 8 * 256, 2, 64
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    out = np.asarray(
        ring_flash_attention(
            q, k, v, mesh, "seq", block_q=128, block_k=128, interpret=True,
            bounded_logits=bounded, qk_int8=True,
        )
    )
    d = np.max(np.abs(out - ref))
    assert 0 < d < 2e-2, (bounded, d)


@needs_8dev
def test_ring_hbm_qk_int8_ragged():
    """W8A8 ring (HBM-staged variant) on a ragged shard: int8 scores +
    padding masking compose; v-scale folding keeps outputs at the 8-bit
    noise level."""
    from omnivggt_tpu.ops.pallas.ring_attention import (
        ring_flash_attention_hbm,
    )

    mesh = _seq_mesh()
    rng = np.random.default_rng(9)
    B, N, H, D = 1, 8 * 200, 1, 64  # 200/device -> padded to lcm(128, 128)
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    out = np.asarray(
        ring_flash_attention_hbm(
            q, k, v, mesh, "seq", block_q=128, block_k=128, interpret=True,
            bounded_logits=True, qk_int8=True,
        )
    )
    d = np.max(np.abs(out - ref))
    assert 0 < d < 2e-2, d
