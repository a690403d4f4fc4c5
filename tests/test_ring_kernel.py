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
    # RDMA LOGICAL device addressing requires a single-axis mesh
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
def test_ring_flash_attention_rejects_oversize():
    mesh = _seq_mesh()
    q = jnp.zeros((1, 8 * 20480, 2, 64), jnp.float32)
    with pytest.raises(ValueError, match="VMEM-resident cap"):
        ring_flash_attention(q, q, q, mesh, "seq", interpret=True)
