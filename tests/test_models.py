"""Model-level parity vs the PyTorch reference with converted random weights.

Uses tiny dimensions (embed 32-64, depth 2, conv patch embed) so the whole
suite runs on CPU; the architecture semantics (alternating attention, modality
injection, DPT pyramid, iterative camera head) are exactly the reference's.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omnivggt_tpu import config as C
from omnivggt_tpu.checkpoint import convert_state_dict, _Consumer, _dinov2, _dpt_head
from tests.reference_util import (
    install_reference,
    reference_available,
    torch_state_dict_to_numpy,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

ATOL = 5e-4


@pytest.fixture(scope="module")
def ref():
    install_reference()
    import torch

    torch.manual_seed(0)
    return torch


def _np(x):
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# DINOv2 backbone
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw", [(28, 28), (28, 42)])
def test_dinov2_parity(ref, hw):
    torch = ref
    from omnivggt.layers.vision_transformer import DinoVisionTransformer
    from omnivggt.layers.block import NestedTensorBlock
    from omnivggt.layers.attention import MemEffAttention
    from functools import partial

    vit = DinoVisionTransformer(
        img_size=28,
        patch_size=7,
        embed_dim=32,
        depth=2,
        num_heads=2,
        num_register_tokens=4,
        init_values=1.0,
        interpolate_antialias=True,
        interpolate_offset=0.0,
        block_chunks=0,
        block_fn=partial(NestedTensorBlock, attn_class=MemEffAttention),
    ).eval()
    # give the pos embed non-trivial values (init is trunc normal 0.02)
    H, W = hw
    x = torch.randn(2, 3, H, W)
    with torch.no_grad():
        out_t = vit.forward_features(x)["x_norm_patchtokens"].numpy()

    sd = {f"d.{k}": v for k, v in torch_state_dict_to_numpy(vit).items()}
    c = _Consumer(sd)
    params = _dinov2(c, "d", depth=2, num_register_tokens=4)
    assert not c.sd, list(c.sd)

    from omnivggt_tpu.models import dinov2 as D

    cfg = C.DinoV2Config(
        img_size=28, patch_size=7, embed_dim=32, depth=2, num_heads=2,
        num_register_tokens=4,
    )
    out_j = np.asarray(
        D.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1)), cfg)
    )
    np.testing.assert_allclose(out_t, out_j, atol=ATOL)


# ---------------------------------------------------------------------------
# ZeroAggregator (conv patch embed)
# ---------------------------------------------------------------------------


def _tiny_torch_aggregator(torch):
    from omnivggt.models.omnivggt_aggregator import ZeroAggregator

    return ZeroAggregator(
        img_size=28,
        patch_size=7,
        embed_dim=32,
        depth=2,
        num_heads=2,
        num_register_tokens=4,
        patch_embed="conv",
        pose_hidden_dim=9,
    ).eval()


def _tiny_agg_cfg():
    return C.AggregatorConfig(
        img_size=28, patch_size=7, embed_dim=32, depth=2, num_heads=2,
        patch_embed="conv",
    )


def _aux_tensors(torch, B, S, H, W, seed=0):
    rng = np.random.default_rng(seed)
    from omnivggt_tpu.utils import geometry as G

    q = rng.normal(size=(B, S, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ex = np.zeros((B, S, 3, 4), np.float32)
    ex[..., :3] = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    ex[..., 3] = rng.normal(size=(B, S, 3)) * 2
    K = np.zeros((B, S, 3, 3), np.float32)
    K[..., 0, 0] = rng.uniform(20, 40, (B, S))
    K[..., 1, 1] = rng.uniform(20, 40, (B, S))
    K[..., 0, 2] = W / 2
    K[..., 1, 2] = H / 2
    K[..., 2, 2] = 1
    depth = rng.uniform(0.1, 10, size=(B, S, H, W, 1)).astype(np.float32)
    mask = (rng.uniform(size=(B, S, H, W)) > 0.3).astype(np.float32)
    return ex, K, depth, mask


@pytest.mark.parametrize(
    "camera_idx,depth_idx",
    [([], []), ([0, 2], []), ([], [1, 2]), ([0, 1, 2], [0, 2]), ([1], [1])],
)
def test_zero_aggregator_parity(ref, camera_idx, depth_idx):
    torch = ref
    agg_t = _tiny_torch_aggregator(torch)
    B, S, H, W = 1, 3, 28, 28
    rng = np.random.default_rng(42)
    images = rng.uniform(size=(B, S, 3, H, W)).astype(np.float32)
    ex, K, depth, mask = _aux_tensors(torch, B, S, H, W)

    with torch.no_grad():
        out_list, psi_t = agg_t(
            torch.from_numpy(images),
            torch.from_numpy(ex),
            torch.from_numpy(K),
            torch.from_numpy(depth),
            torch.from_numpy(mask),
            depth_gt_index=depth_idx,
            camera_gt_index=camera_idx,
        )
    out_t = np.stack([o.numpy() for o in out_list])

    sd = {f"aggregator.{k}": v for k, v in torch_state_dict_to_numpy(agg_t).items()}
    from omnivggt_tpu.models import aggregator as A
    from omnivggt_tpu.models.omnivggt import make_aux

    cfg = _tiny_agg_cfg()
    # reuse the full converter on just the aggregator part
    c = _Consumer(sd)
    from omnivggt_tpu import checkpoint as CK

    params = {
        "patch_embed": {"proj": c.conv("aggregator.patch_embed.proj")},
        "camera_token": c.raw("aggregator.camera_token"),
        "register_token": c.raw("aggregator.register_token"),
        "frame_blocks": CK._stack_blocks(
            [CK._block(c, f"aggregator.frame_blocks.{i}", True, True) for i in range(2)]
        ),
        "global_blocks": CK._stack_blocks(
            [CK._block(c, f"aggregator.global_blocks.{i}", True, True) for i in range(2)]
        ),
        "pose_embeddings": CK._stack_blocks(
            [c.linear(f"aggregator.pose_embeddings.{g}") for g in range(3)]
        ),
        "camera_adapters": CK._stack_blocks(
            [c.linear(f"aggregator.camera_adapters.{g}") for g in range(3)]
        ),
        "depth_placeholder": c.raw("aggregator.depth_placeholder"),
        "depth_patch_embed": {"proj": c.conv("aggregator.depth_patch_embed.proj")},
    }

    aux = make_aux(S, ex, K, depth, mask, depth_idx, camera_idx)
    imgs_j = jnp.asarray(images.transpose(0, 1, 3, 4, 2))
    out_buf, psi_j = A.apply(
        params, imgs_j, cfg, aux, output_layers=(0, 1), dtype=jnp.float32
    )
    assert psi_t == psi_j == 5
    np.testing.assert_allclose(out_t, np.asarray(out_buf), atol=ATOL)


# ---------------------------------------------------------------------------
# Camera head
# ---------------------------------------------------------------------------


def test_camera_head_parity(ref):
    torch = ref
    from omnivggt.heads.camera_head import CameraHead

    head = CameraHead(dim_in=64, trunk_depth=2, num_heads=2).eval()
    rng = np.random.default_rng(3)
    tokens = rng.normal(size=(2, 3, 9, 64)).astype(np.float32)
    with torch.no_grad():
        ref_list = head([torch.from_numpy(tokens)])
    ref_out = np.stack([r.numpy() for r in ref_list])

    sd = {f"camera_head.{k}": v for k, v in torch_state_dict_to_numpy(head).items()}
    from omnivggt_tpu import checkpoint as CK
    from omnivggt_tpu.models import camera_head as CH

    c = _Consumer(sd)
    params = {
        "trunk": CK._stack_blocks(
            [CK._block(c, f"camera_head.trunk.{i}", False, True) for i in range(2)]
        ),
        "token_norm": c.norm("camera_head.token_norm"),
        "trunk_norm": c.norm("camera_head.trunk_norm"),
        "empty_pose_tokens": c.raw("camera_head.empty_pose_tokens"),
        "embed_pose": c.linear("camera_head.embed_pose"),
        "poseLN_modulation": c.linear("camera_head.poseLN_modulation.1"),
        "pose_branch": {
            "fc1": c.linear("camera_head.pose_branch.fc1"),
            "fc2": c.linear("camera_head.pose_branch.fc2"),
        },
    }
    assert not c.sd, list(c.sd)

    cfg = C.CameraHeadConfig(dim_in=64, trunk_depth=2, num_heads=2)
    ours = np.asarray(CH.apply(params, jnp.asarray(tokens), cfg))
    np.testing.assert_allclose(ref_out, ours, atol=ATOL)


# ---------------------------------------------------------------------------
# DPT head
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("output_dim,act,S", [(4, "inv_log", 3), (2, "exp", 2)])
def test_dpt_head_parity(ref, output_dim, act, S):
    torch = ref
    from omnivggt.heads.dpt_head import DPTHead

    head = DPTHead(
        dim_in=64,
        patch_size=14,
        output_dim=output_dim,
        activation=act,
        conf_activation="expp1",
        features=16,
        out_channels=[16, 32, 64, 64],
        intermediate_layer_idx=[0, 0, 1, 1],
    ).eval()

    B, H, W, psi = 1, 56, 56, 5
    n_patch = (H // 14) * (W // 14)
    rng = np.random.default_rng(7)
    tokens = [
        rng.normal(size=(B, S, psi + n_patch, 64)).astype(np.float32) for _ in range(2)
    ]
    images = rng.uniform(size=(B, S, 3, H, W)).astype(np.float32)

    with torch.no_grad():
        preds_t, conf_t = head(
            [torch.from_numpy(t) for t in tokens],
            torch.from_numpy(images),
            patch_start_idx=psi,
            frames_chunk_size=2,
        )

    sd = {f"h.{k}": v for k, v in torch_state_dict_to_numpy(head).items()}
    c = _Consumer(sd)
    params = _dpt_head(c, "h")
    assert not c.sd, list(c.sd)

    from omnivggt_tpu.models import dpt_head as DH

    cfg = C.DPTHeadConfig(
        dim_in=64,
        output_dim=output_dim,
        activation=act,
        features=16,
        out_channels=(16, 32, 64, 64),
        intermediate_layer_idx=(0, 0, 1, 1),
        frames_chunk_size=2,
    )
    buf = jnp.stack([jnp.asarray(t) for t in tokens])  # (2, B, S, P, 64)
    preds_j, conf_j = DH.apply(params, buf, cfg, (H, W), psi, (0, 0, 1, 1))

    # torch preds: (B, S, C, H, W) -> ours are (B, S, H, W, C)
    preds_t = preds_t.numpy()
    np.testing.assert_allclose(preds_t, np.asarray(preds_j), atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(conf_t.numpy(), np.asarray(conf_j), atol=ATOL, rtol=1e-4)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def _tiny_torch_omnivggt(torch):
    import torch.nn as nn
    from omnivggt.models.omnivggt import OmniVGGT
    from omnivggt.heads.camera_head import CameraHead
    from omnivggt.heads.dpt_head import DPTHead

    m = OmniVGGT.__new__(OmniVGGT)
    nn.Module.__init__(m)
    m.aggregator = _tiny_torch_aggregator(torch)
    m.camera_head = CameraHead(dim_in=64, trunk_depth=2, num_heads=2)
    m.point_head = DPTHead(
        dim_in=64, patch_size=7, output_dim=4, activation="inv_log",
        conf_activation="expp1", features=16, out_channels=[16, 32, 64, 64],
        intermediate_layer_idx=[0, 0, 1, 1],
    )
    m.depth_head = DPTHead(
        dim_in=64, patch_size=7, output_dim=2, activation="exp",
        conf_activation="expp1", features=16, out_channels=[16, 32, 64, 64],
        intermediate_layer_idx=[0, 0, 1, 1],
    )
    return m.eval()


def _tiny_cfg():
    return C.OmniVGGTConfig(
        img_size=28,
        patch_size=7,
        embed_dim=32,
        aggregator=C.AggregatorConfig(
            embed_dim=32, depth=2, num_heads=2, patch_embed="conv"
        ),
        camera_head=C.CameraHeadConfig(dim_in=64, trunk_depth=2, num_heads=2),
        depth_head=C.DPTHeadConfig(
            dim_in=64, patch_size=7, output_dim=2, activation="exp", features=16,
            out_channels=(16, 32, 64, 64), intermediate_layer_idx=(0, 0, 1, 1),
        ),
        point_head=C.DPTHeadConfig(
            dim_in=64, patch_size=7, output_dim=4, activation="inv_log", features=16,
            out_channels=(16, 32, 64, 64), intermediate_layer_idx=(0, 0, 1, 1),
        ),
        compute_dtype="float32",
    )


@pytest.mark.parametrize(
    "camera_idx,depth_idx", [([], []), ([0, 1, 2], [0, 2])]
)
def test_full_model_parity(ref, camera_idx, depth_idx):
    torch = ref
    model_t = _tiny_torch_omnivggt(torch)
    B, S, H, W = 1, 3, 28, 28
    rng = np.random.default_rng(11)
    images = rng.uniform(size=(B, S, 3, H, W)).astype(np.float32)
    ex, K, depth, mask = _aux_tensors(torch, B, S, H, W, seed=12)

    with torch.no_grad():
        preds_t = model_t(
            torch.from_numpy(images),
            torch.from_numpy(ex),
            torch.from_numpy(K),
            torch.from_numpy(depth),
            torch.from_numpy(mask),
            depth_gt_index=depth_idx,
            camera_gt_index=camera_idx,
        )

    cfg = _tiny_cfg()
    params = convert_state_dict(torch_state_dict_to_numpy(model_t), cfg)

    from omnivggt_tpu.models import omnivggt as M
    from omnivggt_tpu.models.omnivggt import make_aux

    aux = make_aux(S, ex, K, depth, mask, depth_idx, camera_idx)
    preds_j = M.apply(
        params, jnp.asarray(images.transpose(0, 1, 3, 4, 2)), cfg, aux
    )

    np.testing.assert_allclose(
        preds_t["pose_enc"].numpy(), np.asarray(preds_j["pose_enc"]), atol=ATOL
    )
    np.testing.assert_allclose(
        np.stack([p.numpy() for p in preds_t["pose_enc_list"]]),
        np.asarray(preds_j["pose_enc_list"]),
        atol=ATOL,
    )
    # torch dense outputs are (B, S, H, W, C) already (activate_head permutes)
    np.testing.assert_allclose(
        preds_t["depth"].numpy(), np.asarray(preds_j["depth"]), atol=ATOL, rtol=1e-4
    )
    np.testing.assert_allclose(
        preds_t["depth_conf"].numpy(), np.asarray(preds_j["depth_conf"]),
        atol=ATOL, rtol=1e-4,
    )
    np.testing.assert_allclose(
        preds_t["world_points"].numpy(), np.asarray(preds_j["world_points"]),
        atol=1e-3, rtol=1e-4,
    )
    np.testing.assert_allclose(
        preds_t["world_points_conf"].numpy(), np.asarray(preds_j["world_points_conf"]),
        atol=ATOL, rtol=1e-4,
    )


def test_dpt_chunk_padding_prime_frame_count():
    """K=13 frames with chunk 8 must run ceil(13/8)=2 padded map steps (not 13
    divisor-fallback steps of 1) and produce outputs identical to unchunked."""
    from omnivggt_tpu.models import dpt_head as DH

    assert DH._chunking(13, 8) == (8, 3, 2)
    assert DH._chunking(16, 8) == (8, 0, 2)
    assert DH._chunking(3, 8) == (3, 0, 1)
    assert DH._chunking(5, None) == (5, 0, 1)

    cfg_kw = dict(
        dim_in=64, output_dim=2, activation="exp", features=16,
        out_channels=(16, 32, 64, 64), intermediate_layer_idx=(0, 0, 1, 1),
    )
    B, S, H, W, psi = 1, 13, 28, 28, 5
    n_patch = (H // 14) * (W // 14)
    rng = np.random.default_rng(3)
    buf = jnp.asarray(rng.normal(size=(2, B, S, psi + n_patch, 64)), jnp.float32)
    params = DH.init(jax.random.PRNGKey(0), C.DPTHeadConfig(**cfg_kw))

    chunked = DH.apply(
        params, buf, C.DPTHeadConfig(frames_chunk_size=8, **cfg_kw),
        (H, W), psi, (0, 0, 1, 1),
    )
    whole = DH.apply(
        params, buf, C.DPTHeadConfig(frames_chunk_size=None, **cfg_kw),
        (H, W), psi, (0, 0, 1, 1),
    )
    for c, w in zip(chunked, whole):
        assert c.shape == w.shape
        np.testing.assert_allclose(np.asarray(c), np.asarray(w), atol=1e-5, rtol=1e-5)


def test_dpt_head_s2d_convs_match_default(monkeypatch):
    """OMNIVGGT_S2D_HEAD_CONVS routes the two cout<128 output convs through
    the space-to-depth rewrite; the head output must match the plain-conv
    path to reduction-order tolerance (and the odd-dims fallback inside
    _conv3x3 must keep working — 28px gives even dims at both call sites)."""
    from omnivggt_tpu.models import dpt_head as DH

    cfg_kw = dict(
        dim_in=64, output_dim=2, activation="exp", features=16,
        out_channels=(16, 32, 64, 64), intermediate_layer_idx=(0, 0, 1, 1),
    )
    B, S, H, W, psi = 1, 3, 28, 28, 5
    n_patch = (H // 14) * (W // 14)
    rng = np.random.default_rng(7)
    buf = jnp.asarray(rng.normal(size=(2, B, S, psi + n_patch, 64)), jnp.float32)
    cfg = C.DPTHeadConfig(**cfg_kw)
    params = DH.init(jax.random.PRNGKey(1), cfg)

    monkeypatch.setattr(DH, "_S2D_HEAD_CONVS", False)
    base = DH.apply(params, buf, cfg, (H, W), psi, (0, 0, 1, 1))
    monkeypatch.setattr(DH, "_S2D_HEAD_CONVS", True)
    s2d = DH.apply(params, buf, cfg, (H, W), psi, (0, 0, 1, 1))
    for a, b in zip(base, s2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_make_aux_validation_errors():
    """make_aux rejects inconsistent modality inputs with clear messages
    (regression: depth without mask used to crash later with an opaque
    NoneType error at the aggregator's depth_valid use)."""
    import pytest

    from omnivggt_tpu.models.omnivggt import make_aux

    S = 4
    depth = np.zeros((1, S, 28, 28, 1), np.float32)
    mask = np.ones((1, S, 28, 28), np.float32)
    ex = np.zeros((1, S, 3, 4), np.float32)
    K = np.zeros((1, S, 3, 3), np.float32)

    with pytest.raises(ValueError, match="validity mask"):
        make_aux(S, depth=depth, depth_gt_index=[0, 1])
    with pytest.raises(ValueError, match="depth array"):
        make_aux(S, mask=mask, depth_gt_index=[0, 1])
    with pytest.raises(ValueError, match="extrinsics and intrinsics"):
        make_aux(S, extrinsics=ex, camera_gt_index=[0])

    # the valid combinations still build
    assert make_aux(S, depth=depth, mask=mask, depth_gt_index=[0]) is not None
    assert make_aux(S, extrinsics=ex, intrinsics=K, camera_gt_index=[0]) is not None
    assert make_aux(S) is None
