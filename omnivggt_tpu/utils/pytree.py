"""Pytree host/device movement and collation utilities.

JAX-native equivalent of /root/reference/omnivggt/utils/device.py:11-76
(recursive tensor moving + nested collate) and the live parts of
/root/reference/omnivggt/utils/misc.py (to_cpu, select_first_batch,
invalid_to_nans/zeros, check_valid_tensor)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def _is_array(x):
    return isinstance(x, (np.ndarray, jax.Array))


def to_device(tree, device):
    """Recursively place arrays on a jax device (or sharding)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, device) if _is_array(x) else x, tree
    )


def to_numpy(tree):
    """Recursively fetch arrays to host numpy."""
    return jax.tree.map(lambda x: np.asarray(x) if _is_array(x) else x, tree)


def to_cpu(tree):
    cpu = jax.devices("cpu")[0]
    return to_device(tree, cpu)


def collate_with_cat(whatever, lists: bool = False):
    """Collate a list of sample pytrees into a batch pytree: arrays stack along
    a new leading dim (or concatenate when already batched), everything else
    collected into lists (device.py:47-73 role)."""
    if isinstance(whatever, (tuple, list)) and whatever:
        first = whatever[0]
        if isinstance(first, dict):
            return {
                k: collate_with_cat([d[k] for d in whatever], lists=lists)
                for k in first
            }
        if _is_array(first):
            arrs = [np.asarray(x) for x in whatever]
            if lists:
                return arrs
            # reference torch.cat semantics (device.py:47-73): batched arrays
            # concatenate along dim 0 even when leading dims differ (variable
            # view counts); only trailing-shape mismatches stay a list
            if arrs[0].ndim and all(
                a.ndim == arrs[0].ndim and a.shape[1:] == arrs[0].shape[1:]
                for a in arrs
            ):
                return np.concatenate(arrs, axis=0)
            if not arrs[0].ndim and all(a.shape == () for a in arrs):
                return np.stack(arrs)
            return arrs
        if isinstance(first, (tuple, list)):
            return type(first)(
                collate_with_cat([x[i] for x in whatever], lists=lists)
                for i in range(len(first))
            )
    return whatever


def select_first_batch(inputs: dict, dtype=None) -> dict:
    """Strip the batch dimension (keep element 0) from the standard prediction
    keys, for single-scene export (misc.py:255-284 role)."""
    keys = {
        "pose_enc", "depth", "world_points", "images", "extrinsic", "intrinsic",
        "world_points_from_depth", "depth_conf", "world_points_conf",
    }
    out = {}
    for key, value in inputs.items():
        if key == "pose_enc_list" and (
            isinstance(value, list) or _is_array(value)
        ):
            value = value[-1]  # last iterate, any container (list/jax/numpy)
            key = "pose_enc"
        if _is_array(value) and key in keys:
            value = np.asarray(value[:1])
            if dtype is not None:
                value = value.astype(dtype)
        out[key] = value
    return out


def invalid_to_nans(arr: jnp.ndarray, valid_mask, ndim: int = 999) -> jnp.ndarray:
    if valid_mask is not None:
        arr = jnp.where(valid_mask[..., None] if arr.ndim == valid_mask.ndim + 1 else valid_mask, arr, jnp.nan)
    if arr.ndim > ndim:
        arr = arr.reshape(*arr.shape[: ndim - 2], -1, arr.shape[-1])
    return arr


def invalid_to_zeros(arr: jnp.ndarray, valid_mask, ndim: int = 999):
    if valid_mask is not None:
        mask = valid_mask[..., None] if arr.ndim == valid_mask.ndim + 1 else valid_mask
        arr = jnp.where(mask, arr, 0)
        nnz = jnp.sum(valid_mask.reshape(valid_mask.shape[0], -1), axis=1)
    else:
        nnz = arr.size // len(arr) if len(arr) else 0
    if arr.ndim > ndim:
        arr = arr.reshape(*arr.shape[: ndim - 2], -1, arr.shape[-1])
    return arr, nnz


def check_valid_array(x, name: str = "array") -> Optional[str]:
    """NaN/Inf guard (the reference's check_valid_tensor has a latent missing
    import, misc.py:311-321; this one works). Returns a message or None."""
    if x is None:
        return None
    x = np.asarray(x)
    n_nan = int(np.isnan(x).sum())
    n_inf = int(np.isinf(x).sum())
    if n_nan or n_inf:
        return f"{name}: {n_nan} NaNs, {n_inf} Infs out of {x.size}"
    return None
