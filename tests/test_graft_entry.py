"""Protect the driver entry points: the multichip dryrun must keep compiling
and executing on the virtual 8-device CPU mesh."""

import sys

import pytest

import jax

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_shapes():
    """entry() returns a jittable fn + args whose abstract eval succeeds
    (full compile is the driver's job; eval_shape catches structure breaks)."""
    import __graft_entry__ as g
    from omnivggt_tpu.config import OmniVGGTConfig
    from omnivggt_tpu.models import omnivggt as M

    cfg = OmniVGGTConfig()
    params = jax.eval_shape(lambda: M.init(jax.random.PRNGKey(0), cfg))
    import jax.numpy as jnp

    images = jax.ShapeDtypeStruct((1, 2, 518, 518, 3), jnp.float32)

    def fn(params, images):
        return M.apply(params, images, cfg)["pose_enc"]

    out = jax.eval_shape(fn, params, images)
    assert out.shape == (1, 2, 9)


def test_make_mesh_too_few_devices_clear_error():
    """make_mesh must fail with an explanatory ValueError when the mesh needs
    more devices than exist (not an opaque numpy reshape error) — the failure
    mode behind the round-1 red MULTICHIP check."""
    from omnivggt_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="needs 8 devices|needs 16 devices"):
        make_mesh(data=2, seq=8, devices=jax.devices()[:2])


def test_provision_devices_noop_when_initialized_with_enough():
    """With the backend already initialised at >= n devices (this suite's
    8-device CPU backend), provisioning is a no-op rather than an error."""
    import __graft_entry__ as g

    g._provision_devices(8)
    assert len(jax.devices()) >= 8


def test_provision_devices_errors_when_initialized_too_small():
    import __graft_entry__ as g

    with pytest.raises(RuntimeError, match="needs 999 devices"):
        g._provision_devices(999)
