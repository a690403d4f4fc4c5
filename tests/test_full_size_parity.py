"""Full-architecture parity: the REAL OmniVGGT (ViT-L/14 DINOv2 embedder,
24+24 alternating blocks, 2048-d heads, ~1.2B params) with converted random
weights, compared against the PyTorch reference at a small image size
(140x140 -> 10x10 patches) so it runs on CPU in minutes.

This closes the gap the tiny-config tests leave: the exact production
dimensions, layer counts, DPT level indices [4,11,17,23], and the DINOv2
backbone are all exercised."""

import gc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omnivggt_tpu import config as C
from omnivggt_tpu.checkpoint import convert_state_dict
from tests.reference_util import (
    install_reference,
    reference_available,
    torch_state_dict_to_numpy,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference not mounted"),
]


def test_flagship_architecture_parity():
    install_reference()
    import torch

    from omnivggt.models.omnivggt import OmniVGGT as TorchOmniVGGT

    torch.manual_seed(0)
    with torch.no_grad():
        model_t = TorchOmniVGGT().eval()

    B, S, H, W = 1, 2, 140, 140
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(B, S, 3, H, W)).astype(np.float32)
    from tests.test_models import _aux_tensors

    ex, K, depth, mask = _aux_tensors(torch, B, S, H, W, seed=1)

    with torch.no_grad():
        preds_t = model_t(
            torch.from_numpy(images),
            torch.from_numpy(ex), torch.from_numpy(K),
            torch.from_numpy(depth), torch.from_numpy(mask),
            depth_gt_index=[1], camera_gt_index=[0, 1],
        )
    pose_t = preds_t["pose_enc"].numpy()
    depth_pred_t = preds_t["depth"].numpy()
    pts_t = preds_t["world_points"].numpy()

    sd = torch_state_dict_to_numpy(model_t)
    del model_t, preds_t
    gc.collect()

    cfg = C.OmniVGGTConfig(compute_dtype="float32")
    params = convert_state_dict(sd, cfg)
    del sd
    gc.collect()

    from omnivggt_tpu.models import omnivggt as M
    from omnivggt_tpu.models.omnivggt import make_aux

    aux = make_aux(S, ex, K, depth, mask, [1], [0, 1])
    preds_j = M.apply(
        params, jnp.asarray(images.transpose(0, 1, 3, 4, 2)), cfg, aux
    )

    np.testing.assert_allclose(
        pose_t, np.asarray(preds_j["pose_enc"]), atol=2e-3
    )
    np.testing.assert_allclose(
        depth_pred_t, np.asarray(preds_j["depth"]), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        pts_t, np.asarray(preds_j["world_points"]), atol=5e-3, rtol=1e-3
    )
