"""Device mesh construction for multi-chip execution.

The reference is strictly single-device (SURVEY.md §2.6); this subsystem is the
TPU-native replacement for the distributed layer it lacks: one global
`jax.sharding.Mesh` with axes

  - "data": scene/batch parallelism (DCN-friendly; cross-host)
  - "seq":  sequence parallelism over frames / tokens (ICI; the axis the
            global-attention stage communicates over)

Frame attention, patch embed and DPT heads shard trivially over "seq" (each
frame independent); global attention all-gathers or ring-permutes KV across
"seq" (parallel/attention.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_mesh(
    data: int = 1, seq: Optional[int] = None, devices=None
) -> Mesh:
    """Build a (data, seq) mesh. With seq=None, all remaining devices go to the
    sequence axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if seq is None:
        if n % data != 0:
            raise ValueError(f"{n} devices not divisible by data={data}")
        seq = n // data
    if data * seq > n:
        raise ValueError(
            f"mesh ({data} data x {seq} seq) needs {data * seq} devices but "
            f"only {n} are available ({[str(d) for d in devices[:4]]}"
            f"{'...' if n > 4 else ''}); on a single-chip host provision a "
            f"virtual CPU backend first (jax_num_cpu_devices / "
            f"--xla_force_host_platform_device_count)"
        )
    if data * seq < n:
        devices = devices[: data * seq]
    dev_array = np.asarray(devices).reshape(data, seq)
    return Mesh(dev_array, (DATA_AXIS, SEQ_AXIS))


def multihost_initialize(**kwargs) -> None:
    """jax.distributed bring-up for multi-host slices.

    Only 'already initialised' is tolerated; a genuine bring-up failure
    (bad coordinator address, firewalled port) must raise — swallowing it
    would silently degrade an 8-host job to independent single-host
    processes each training 1/8th of the intended mesh."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return
        raise


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """(B, S, ...) arrays: batch over data, frames over seq."""
    return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of (B, S, ...) arrays onto the mesh (frames over seq)."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, *([None] * (x.ndim - 2))))
        )
        if hasattr(x, "ndim") and x.ndim >= 2
        else x,
        tree,
    )
