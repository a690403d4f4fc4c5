"""Sharding strategy objects threaded through the model.

`AttnShard` selects a mesh-parallel attention strategy per call site:
  - rows:       batch/frames dim sharded, no communication (frame attention,
                DINOv2 per-image attention)
  - allgather:  sequence dim sharded, KV all-gathered over ICI (global attn)
  - ring:       sequence dim sharded, KV ring-rotated with ppermute

`ModelSharding` bundles the mesh + the specs the aggregator uses to constrain
activations so XLA partitions the pointwise work along the same axes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omnivggt_tpu.parallel import attention as pattn
from omnivggt_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS


@dataclass(frozen=True)
class AttnShard:
    mesh: Mesh
    kind: str  # "rows" | "allgather" | "ring"
    axis: object = (DATA_AXIS, SEQ_AXIS)  # rows spec or seq axis name

    def resolve_impl(self, shape, impl: str = "auto") -> str:
        """The attention impl the PER-SHARD compute will actually use, for
        prologue decisions (e.g. the RoPE form in ops/layers.attention):
        the ring strategies always consume q/k in a Pallas kernel, while
        rows/allgather run ops.attention per shard on the shard-local
        shape — which can resolve to XLA attention, whose fused prologue
        prefers the concatenate RoPE form."""
        from omnivggt_tpu.ops import attention as AT

        if self.kind in ("ring", "ring_fused"):
            return "flash"
        B, N, H, D = shape
        if self.kind == "rows":
            # axis may be a str, a tuple of mesh axes, or a full
            # PartitionSpec whose FIRST entry shards the rows dim (the forms
            # attend()/rows_sharded_attention accept) — all must resolve on
            # the same per-shard batch the shard_map body will see
            rows = self.axis
            if isinstance(rows, P):
                rows = rows[0] if len(rows) else None
            if rows is None:
                axes = ()
            elif isinstance(rows, tuple):
                axes = rows
            else:
                axes = (rows,)
            factor = 1
            for a in axes:
                factor *= self.mesh.shape.get(a, 1)
            return AT.resolve_impl((max(B // factor, 1), N, H, D), impl)
        # allgather: queries stay sequence-sharded; KV is gathered to full
        # length, and resolve_impl keys on the (query) sequence length
        n_dev = self.mesh.shape.get(self.axis, 1)
        return AT.resolve_impl((B, max(N // n_dev, 1), H, D), impl)

    def attend(self, q, k, v, impl, kv_valid=None, bounded_logits=False,
               qk_int8=False):
        # qk_int8 reaches rows/allgather (their local compute is the flash
        # kernel) and the fused ring (int8 KV shards with ring-global
        # per-head scales — half the ICI bytes); only the unfused ppermute
        # ring ignores it (bf16 einsums)
        if self.kind == "rows":
            # kv_valid here is a TOKEN-level valid prefix within each row's
            # (unsharded) sequence — e.g. dinov2.apply's sublane-alignment
            # padding — which applies identically on every shard. (Frame-
            # level bucketed-serving masking never reaches rows attention:
            # per-frame attention has no cross-frame keys to mask.)
            return pattn.rows_sharded_attention(
                q, k, v, self.mesh, self.axis, impl=impl, kv_valid=kv_valid,
                bounded_logits=bounded_logits, qk_int8=qk_int8,
            )
        if self.kind == "allgather":
            return pattn.allgather_attention(
                q, k, v, self.mesh, self.axis, impl=impl, kv_valid=kv_valid,
                bounded_logits=bounded_logits, qk_int8=qk_int8,
            )
        if self.kind in ("ring", "ring_fused"):
            if kv_valid is not None:
                raise NotImplementedError(
                    "valid-prefix masking is not wired into the ring strategy;"
                    " use global_attn='allgather' for bucketed serving"
                )
            if self.kind == "ring_fused":
                return pattn.fused_ring_attention(
                    q, k, v, self.mesh, self.axis,
                    bounded_logits=bounded_logits, qk_int8=qk_int8,
                )
            return pattn.ring_attention(
                q, k, v, self.mesh, self.axis, bounded_logits=bounded_logits
            )
        raise ValueError(self.kind)


@dataclass(frozen=True)
class ModelSharding:
    """How the OmniVGGT forward is laid out on the mesh."""

    mesh: Mesh
    global_attn: str = "allgather"  # or "ring"

    def constrain(self, x, *spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(*spec))
        )

    def constrain_frames(self, x):
        """(B, S, ...) -> batch over data, frames over seq."""
        return self.constrain(x, DATA_AXIS, SEQ_AXIS, *([None] * (x.ndim - 2)))

    def constrain_rows(self, x):
        """(B*S, ...) flattened rows over (data, seq)."""
        return self.constrain(x, (DATA_AXIS, SEQ_AXIS), *([None] * (x.ndim - 1)))

    @property
    def frame_attn_shard(self) -> AttnShard:
        return AttnShard(self.mesh, "rows", (DATA_AXIS, SEQ_AXIS))

    @property
    def global_attn_shard(self) -> AttnShard:
        return AttnShard(self.mesh, self.global_attn, SEQ_AXIS)

    def constrain_tokens_global(self, x):
        """(B, S*P, C) global-attention layout: sequence over seq axis."""
        return self.constrain(x, DATA_AXIS, SEQ_AXIS, None)
