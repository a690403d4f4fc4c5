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
