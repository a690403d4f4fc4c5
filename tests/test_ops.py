"""Op-level parity: RoPE, attention, resize, activations, layers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omnivggt_tpu.ops import rope as R
from omnivggt_tpu.ops import layers as L
from omnivggt_tpu.ops.activations import activate_head, activate_pose, inverse_log_transform
from omnivggt_tpu.ops.attention import _attention_blockwise, _attention_xla
from omnivggt_tpu.ops.resize import interpolate
from tests.reference_util import install_reference, reference_available

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@needs_ref
def test_rope_parity():
    install_reference()
    import torch
    from omnivggt.layers.rope import RotaryPositionEmbedding2D, PositionGetter

    rng = np.random.default_rng(0)
    B, H, D, gh, gw, psi = 2, 4, 64, 3, 5, 5
    N = psi + gh * gw
    pos_t = PositionGetter()(B, gh, gw, torch.device("cpu")) + 1
    pos_t = torch.cat([torch.zeros(B, psi, 2, dtype=pos_t.dtype), pos_t], dim=1)
    x = rng.normal(size=(B, H, N, D)).astype(np.float32)
    out_t = RotaryPositionEmbedding2D(frequency=100.0)(torch.from_numpy(x), pos_t).numpy()

    cos, sin = R.rope_tables(gh, gw, psi, D, 100.0)
    out_j = np.asarray(
        R.apply_rope(jnp.asarray(x.transpose(0, 2, 1, 3)), cos, sin)
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(out_t, out_j, atol=1e-5)


def test_rope_bf16_matmul_path_bitwise():
    """The bf16 matmul rotate-half (signed permutation through the MXU) must
    be bit-identical to the slice/concatenate form: every P row selects
    exactly one +-x element, so the products and sums are the same floats."""
    rng = np.random.default_rng(4)
    B, N, H, D = 2, 21, 4, 64
    cos, sin = R.rope_tables(4, 4, 5, D, 100.0)
    x32 = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)

    got = R.apply_rope(x16, cos, sin)  # matmul path (bf16)
    cos_c = cos.astype(jnp.bfloat16)[None, :, None, :]
    sin_c = sin.astype(jnp.bfloat16)[None, :, None, :]
    want = x16 * cos_c + R._rotate_half_per_axis(x16) * sin_c
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_attention_impls_agree():
    rng = np.random.default_rng(1)
    q, k, v = [
        jnp.asarray(rng.normal(size=(2, 300, 4, 64)).astype(np.float32)) for _ in range(3)
    ]
    a1 = np.asarray(_attention_xla(q, k, v))
    a2 = np.asarray(_attention_blockwise(q, k, v, block_k=128))
    np.testing.assert_allclose(a1, a2, atol=2e-5)


@needs_ref
def test_attention_parity_vs_torch_sdpa():
    install_reference()
    import torch

    rng = np.random.default_rng(2)
    q, k, v = [rng.normal(size=(2, 100, 4, 32)).astype(np.float32) for _ in range(3)]
    ours = np.asarray(_attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    ref = (
        torch.nn.functional.scaled_dot_product_attention(
            *[torch.from_numpy(x.transpose(0, 2, 1, 3).copy()) for x in (q, k, v)]
        )
        .numpy()
        .transpose(0, 2, 1, 3)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_flash_attention_interpret_mode():
    """Pallas kernel in interpreter mode vs the XLA implementation."""
    from omnivggt_tpu.ops.pallas import flash_attention as FA
    import functools
    from unittest import mock

    rng = np.random.default_rng(3)
    q, k, v = [
        jnp.asarray(rng.normal(size=(1, 200, 2, 64)).astype(np.float32)) for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))

    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        out = np.asarray(FA._flash_forward(q, k, v, 64, 128))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_attention_bounded_logits():
    """Bounded mode (softmax at a fixed max of 0, no running-max pass)
    matches the standard kernel and XLA on qk-norm-scale inputs, on a ragged
    shape, and through the gradient."""
    from omnivggt_tpu.ops.pallas import flash_attention as FA
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(7)
    # unit-scale inputs, like qk-normed q/k: scores well within the bound
    q, k, v = [
        jnp.asarray(rng.normal(size=(1, 203, 2, 64)).astype(np.float32))
        for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        out = np.asarray(FA._flash_forward(q, k, v, 64, 128, bounded=True))
        np.testing.assert_allclose(out, ref, atol=2e-5)

        # lse contract: bounded forward's lse feeds the same fused backward
        out_l, lse = FA._flash_forward(
            q, k, v, 64, 128, return_lse=True, bounded=True
        )
        _, lse_std = FA._flash_forward(
            q, k, v, 64, 128, return_lse=True, bounded=False
        )
        np.testing.assert_allclose(
            np.asarray(lse), np.asarray(lse_std), atol=1e-5, rtol=1e-5
        )

        def loss(q, k, v):
            return jnp.sum(
                FA.flash_attention(q, k, v, 64, 128, bounded_logits=True) ** 2
            )

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(_attention_xla(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )

    # the insurance clamp saturates instead of overflowing on absurd scores
    qb = q * 40.0
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        out_big = np.asarray(FA._flash_forward(qb, k, v, 64, 128, bounded=True))
    assert np.isfinite(out_big).all()


def test_flash_attention_edge_shapes():
    """Odd head counts, tiny heads, and D=128 — the latter disables the
    ones-column fold (no spare lanes) and exercises the VPU row-sum branch
    in both standard and bounded modes."""
    from omnivggt_tpu.ops.pallas import flash_attention as FA
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(17)
    orig = pl.pallas_call
    for (B, N, H, D) in [(1, 130, 1, 32), (2, 300, 3, 128)]:
        q, k, v = [
            jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
            for _ in range(3)
        ]
        ref = np.asarray(_attention_xla(q, k, v))
        with mock.patch.object(
            pl, "pallas_call", functools.partial(orig, interpret=True)
        ):
            out = np.asarray(FA._flash_forward(q, k, v, 64, 128))
            out_b = np.asarray(
                FA._flash_forward(q, k, v, 64, 128, bounded=True)
            )
        np.testing.assert_allclose(out, ref, atol=3e-5, err_msg=f"D={D}")
        np.testing.assert_allclose(out_b, ref, atol=3e-5, err_msg=f"D={D}b")


def test_flash_attention_qk_int8():
    """int8-qk mode (W8A8 score matmul, per-head max-abs scales) stays at
    the 8-bit quantisation noise level vs exact attention — bounded and
    running-max softmax, ragged shapes, and the dynamic kv_valid variant."""
    from omnivggt_tpu.ops.pallas import flash_attention as FA
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(11)
    orig = pl.pallas_call
    # unit-scale inputs (the qk-normed regime the serving mode certifies on)
    q, k, v = [
        jnp.asarray(rng.normal(size=(1, 203, 2, 64)).astype(np.float32))
        for _ in range(3)
    ]
    ref = np.asarray(_attention_xla(q, k, v))
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        for bounded in (True, False):
            out = np.asarray(
                FA._flash_forward(q, k, v, 64, 128, bounded=bounded,
                                  qk_int8=True)
            )
            d = np.max(np.abs(out - ref))
            assert 0 < d < 2e-2, (bounded, d)

        # dynamic valid-prefix masking composes with the int8 scores
        nv = 150
        ref_m = np.asarray(_attention_xla(q, k, v, kv_valid=nv))
        out_m = np.asarray(
            FA._flash_forward(q, k, v, 64, 128, kv_valid=jnp.int32(nv),
                              bounded=True, qk_int8=True)
        )
        # 150-key softmax averages less quantisation noise than the full
        # sequence; 8-bit level here is a few e-2
        assert np.max(np.abs(out_m - ref_m)) < 5e-2

        # bucketed-serving contract: the padded forward's valid rows must
        # match the unpadded forward — kv_valid excludes padding from the
        # quantisation scales, so the int8 values of real rows are identical
        nv2 = 150
        out_pad = np.asarray(
            FA._flash_forward(q, k, v, 64, 128, kv_valid=jnp.int32(nv2),
                              bounded=True, qk_int8=True)
        )[:, :nv2]
        out_trunc = np.asarray(
            FA._flash_forward(q[:, :nv2], k[:, :nv2], v[:, :nv2], 64, 128,
                              kv_valid=jnp.int32(nv2), bounded=True,
                              qk_int8=True)
        )
        np.testing.assert_allclose(out_pad, out_trunc, atol=1e-5)

        # serving-only: no LSE path
        import pytest as _pytest

        with _pytest.raises(ValueError, match="serving-only"):
            FA._flash_forward(q, k, v, 64, 128, return_lse=True, qk_int8=True)

        # the public entry routes qk_int8 outside the custom-vjp wrapper
        out_pub = np.asarray(
            FA.flash_attention(q, k, v, 64, 128, bounded_logits=True,
                               qk_int8=True)
        )
        assert np.max(np.abs(out_pub - ref)) < 2e-2


def test_qk_logit_bound_certification():
    """The weight-dependent logit bound that certifies the fixed-max flash
    softmax: ~sqrt(D) at init (unit norm scales, zero biases), and the
    checkpoint-load hook flips bounded_attn_logits off for weights that
    break it."""
    import jax as _jax

    from omnivggt_tpu.config import tiny_test_config
    from omnivggt_tpu.models import omnivggt as M
    from omnivggt_tpu.models.omnivggt import _certify_bounded_logits
    from omnivggt_tpu.utils.validation import qk_logit_bound

    cfg = tiny_test_config()
    params = M.init(_jax.random.PRNGKey(0), cfg)
    head_dim = cfg.embed_dim // cfg.aggregator.num_heads
    bound = qk_logit_bound(params, head_dim)
    assert abs(bound - np.sqrt(head_dim)) < 1e-5  # A_q = A_k = 1 at init

    assert _certify_bounded_logits(cfg, params).bounded_attn_logits

    # inflate one stacked q_norm scale far beyond the certifiable range
    bad = jax.tree_util.tree_map(lambda x: x, params)
    qn = bad["aggregator"]["frame_blocks"]["attn"]["q_norm"]
    qn["scale"] = qn["scale"] * 100.0
    assert qk_logit_bound(bad, head_dim) > 40.0
    assert not _certify_bounded_logits(cfg, bad).bounded_attn_logits


def test_flash_attention_gradient():
    """The custom VJP (blockwise recompute) matches the gradient of the plain
    XLA attention."""
    from omnivggt_tpu.ops.pallas.flash_attention import flash_attention
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(11)
    q, k, v = [
        jnp.asarray(rng.normal(size=(1, 96, 2, 32)).astype(np.float32)) for _ in range(3)
    ]

    def loss_ref(q, k, v):
        return jnp.sum(_attention_xla(q, k, v) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("bounded", [False, True])
def test_flash_attention_masked_gradient(bounded):
    """The kv_valid (valid-prefix masked) fused backward matches XLA autodiff
    through masked attention — including zero gradients for masked keys'
    k/v rows, and with pad query rows carrying zero cotangents (the caller
    discards pad outputs, as dinov2.apply's token padding does)."""
    from omnivggt_tpu.ops.pallas.flash_attention import flash_attention
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(13)
    NV = 91  # valid prefix of N=96
    q, k, v = [
        jnp.asarray(rng.normal(size=(1, 96, 2, 32)).astype(np.float32))
        for _ in range(3)
    ]
    row_w = jnp.asarray((np.arange(96) < NV).astype(np.float32))[None, :, None, None]

    def loss_ref(q, k, v):
        return jnp.sum((_attention_xla(q, k, v, kv_valid=NV) * row_w) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(
            (flash_attention(
                q, k, v, kv_valid=jnp.int32(NV), bounded_logits=bounded
            ) * row_w) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)
    # masked keys must get exactly zero dk/dv
    assert np.all(np.asarray(g_flash[1])[:, NV:] == 0)
    assert np.all(np.asarray(g_flash[2])[:, NV:] == 0)


def test_qconv2d_int8_matches_fp_conv():
    """W8A8 conv (per-out-channel weight + per-image activation scales)
    tracks the fp conv at the 8-bit noise level, and its int8 accumulation
    is exact: dequantising the s32 conv of the quantised operands
    reproduces the fp conv OF the quantised operands bitwise."""
    from omnivggt_tpu.ops.layers import conv2d, qconv2d_int8

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 12, 14, 16)).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.normal(size=(3, 3, 16, 8)).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
    }
    ref = np.asarray(conv2d(p, x, padding=((1, 1), (1, 1))))
    out = np.asarray(qconv2d_int8(p, x, padding=((1, 1), (1, 1))))
    # quant noise: |err| <~ K * (a_scale*|w| + w_scale*|a|) summed over the
    # 3x3x16 receptive field — checked against an empirical 8-bit bound
    scale = np.abs(ref).max()
    assert np.max(np.abs(out - ref)) < 0.05 * scale, np.max(np.abs(out - ref))

    # exactness of the integer path itself
    ws = np.abs(np.asarray(p["w"])).max(axis=(0, 1, 2)) / 127.0
    wq = np.round(np.asarray(p["w"]) / ws)
    ax = np.abs(np.asarray(x)).max(axis=(1, 2, 3), keepdims=True) / 127.0
    xq = np.round(np.asarray(x) / ax)
    ref_q = np.asarray(
        conv2d({"w": jnp.asarray(wq)}, jnp.asarray(xq),
               padding=((1, 1), (1, 1)))
    ) * ax * ws + np.asarray(p["b"])
    np.testing.assert_allclose(out, ref_q, rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,hw",
    [(16, 8, (10, 12)), (16, 8, (2, 2)), (7, 3, (8, 6))],
)
def test_conv2d_s2d_matches_conv(cin, cout, hw):
    """The space-to-depth 2x2-block rewrite of a 3x3 stride-1 pad-1 conv
    (MXU lane-fill for the cout<128 DPT output convs) is numerically the
    plain conv: the extra kernel taps are exact zeros."""
    from omnivggt_tpu.ops.layers import conv2d, conv2d_s2d

    rng = np.random.default_rng(11)
    H, W = hw
    x = jnp.asarray(rng.normal(size=(2, H, W, cin)).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)),
    }
    ref = np.asarray(conv2d(p, x, padding=((1, 1), (1, 1))))
    out = np.asarray(conv2d_s2d(p, x))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)

    # int8 route composes: W8A8 on the transformed kernel tracks the fp conv
    out8 = np.asarray(conv2d_s2d(p, x, int8=True))
    assert np.max(np.abs(out8 - ref)) < 0.05 * np.abs(ref).max()

    # odd spatial dims are rejected (the dispatch wrapper falls back)
    with pytest.raises(ValueError):
        conv2d_s2d(p, x[:, :-1])


@needs_ref
@pytest.mark.parametrize(
    "mode,align,antialias,in_hw,out_hw",
    [
        ("bilinear", True, False, (7, 9), (14, 18)),
        ("bilinear", True, False, (14, 18), (37, 37)),
        ("bilinear", False, False, (7, 9), (21, 27)),
        ("bicubic", False, False, (37, 37), (28, 37)),
        ("bicubic", False, True, (37, 37), (28, 30)),
        ("bicubic", False, True, (37, 37), (40, 37)),
        ("bilinear", True, False, (16, 16), (8, 8)),
    ],
)
def test_interpolate_matches_torch(mode, align, antialias, in_hw, out_hw):
    install_reference()
    import torch

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, *in_hw)).astype(np.float32)
    kwargs = dict(size=out_hw, mode=mode, antialias=antialias)
    if not (antialias and not align):
        kwargs["align_corners"] = align
    else:
        kwargs["align_corners"] = False
    ref = torch.nn.functional.interpolate(torch.from_numpy(x), **kwargs).numpy()
    ours = np.asarray(
        interpolate(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            out_hw,
            mode=mode,
            align_corners=align,
            antialias=antialias,
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ref, ours, atol=5e-5)


@needs_ref
def test_activations_parity():
    install_reference()
    import torch
    from omnivggt.heads import head_act as T

    rng = np.random.default_rng(6)
    y = rng.normal(size=(2, 5, 7)).astype(np.float32) * 3
    np.testing.assert_allclose(
        T.inverse_log_transform(torch.from_numpy(y)).numpy(),
        np.asarray(inverse_log_transform(jnp.asarray(y))),
        atol=1e-5,
        rtol=5e-5,
    )

    pose = rng.normal(size=(2, 3, 9)).astype(np.float32)
    ref = T.activate_pose(torch.from_numpy(pose), "linear", "linear", "relu").numpy()
    ours = np.asarray(activate_pose(jnp.asarray(pose), "linear", "linear", "relu"))
    np.testing.assert_allclose(ref, ours, atol=1e-6)

    for act, dim in (("inv_log", 4), ("exp", 2)):
        out = rng.normal(size=(3, dim, 8, 8)).astype(np.float32)
        p_t, c_t = T.activate_head(torch.from_numpy(out), act, "expp1")
        p_j, c_j = activate_head(
            jnp.asarray(out.transpose(0, 2, 3, 1)), act, "expp1"
        )
        np.testing.assert_allclose(p_t.numpy(), np.asarray(p_j), atol=1e-5, rtol=5e-5)
        np.testing.assert_allclose(c_t.numpy(), np.asarray(c_j), atol=1e-5, rtol=5e-5)


@needs_ref
def test_block_parity():
    """Transformer Block (qk-norm + RoPE + LayerScale) vs the reference Block."""
    install_reference()
    import torch
    from omnivggt.layers.block import Block
    from omnivggt.layers.rope import RotaryPositionEmbedding2D, PositionGetter
    from omnivggt_tpu.checkpoint import _Consumer, _block

    dim, heads, gh, gw, psi = 64, 4, 3, 3, 2
    N = psi + gh * gw
    torch.manual_seed(0)
    rope_t = RotaryPositionEmbedding2D(frequency=100.0)
    blk = Block(dim=dim, num_heads=heads, qk_norm=True, init_values=0.01, rope=rope_t).eval()

    pos = PositionGetter()(2, gh, gw, torch.device("cpu")) + 1
    pos = torch.cat([torch.zeros(2, psi, 2, dtype=pos.dtype), pos], dim=1)
    x = torch.randn(2, N, dim)
    with torch.no_grad():
        ref = blk(x, pos=pos).numpy()

    sd = {k: v.detach().numpy() for k, v in blk.state_dict().items()}
    c = _Consumer({f"b.{k}": v for k, v in sd.items()})
    params = _block(c, "b", qk_norm=True, has_ls=True)
    assert not c.sd, c.sd

    cos, sin = R.rope_tables(gh, gw, psi, dim // heads, 100.0)
    ours = np.asarray(
        L.block(params, jnp.asarray(x.numpy()), cos, sin, num_heads=heads)
    )
    np.testing.assert_allclose(ref, ours, atol=2e-5)


@needs_ref
def test_patch_embed_parity():
    install_reference()
    import torch
    from omnivggt.layers import PatchEmbed

    torch.manual_seed(1)
    pe = PatchEmbed(img_size=28, patch_size=7, in_chans=3, embed_dim=32).eval()
    x = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        ref = pe(x).numpy()

    w = pe.proj.weight.detach().numpy().transpose(2, 3, 1, 0)
    b = pe.proj.bias.detach().numpy()
    ours = np.asarray(
        L.patch_embed(
            {"proj": {"w": jnp.asarray(w), "b": jnp.asarray(b)}},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            7,
        )
    )
    np.testing.assert_allclose(ref, ours, atol=1e-5)


# ---------------------------------------------------------------------------
# DropPath / stochastic depth
# ---------------------------------------------------------------------------


def test_drop_path_mask_values_and_expectation():
    """Per-sample mask: each sample is either zeroed or scaled by 1/keep_prob
    (reference layers/drop_path.py:14-24); the estimator is unbiased."""
    from omnivggt_tpu.ops.layers import drop_path

    x = jnp.ones((512, 3, 4))
    rate = 0.25
    y = np.asarray(drop_path(jax.random.PRNGKey(0), x, rate))
    per_sample = y.reshape(512, -1)
    # all-or-nothing per sample
    assert np.all((per_sample == 0.0).all(axis=1) | (per_sample > 0.0).all(axis=1))
    kept = per_sample[per_sample[:, 0] > 0]
    np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-6)
    # unbiased in expectation (512 samples: loose bound)
    assert abs(y.mean() - 1.0) < 0.15


def test_block_drop_path_eval_vs_train():
    """No key -> deterministic (identical to rate=0); key + rate -> stochastic
    but reproducible for a fixed key."""
    from omnivggt_tpu.ops import layers as L

    p = L.block_init(jax.random.PRNGKey(1), 32, 2, init_values=0.01)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 5, 32)), jnp.float32)

    base = L.block(p, x, num_heads=2)
    eval_mode = L.block(p, x, num_heads=2, drop_path_rate=0.5, drop_path_key=None)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(eval_mode))

    k = jax.random.PRNGKey(7)
    t1 = L.block(p, x, num_heads=2, drop_path_rate=0.5, drop_path_key=k)
    t2 = L.block(p, x, num_heads=2, drop_path_rate=0.5, drop_path_key=k)
    t3 = L.block(p, x, num_heads=2, drop_path_rate=0.5,
                 drop_path_key=jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert not np.array_equal(np.asarray(t1), np.asarray(t3))
    assert not np.array_equal(np.asarray(t1), np.asarray(base))


def test_attention_kv_valid_masking_all_impls():
    """Valid-prefix key masking: every impl must equal unpadded attention on
    the valid slice, for padded inputs of any garbage content."""
    from omnivggt_tpu.ops.attention import (
        _attention_blockwise,
        scaled_dot_product_attention,
    )
    from omnivggt_tpu.ops.pallas import flash_attention as FA
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(9)
    NV, NPAD = 150, 250  # 100 garbage key rows appended
    q = jnp.asarray(rng.normal(size=(2, NPAD, 2, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, NPAD, 2, 64)) * 5).astype(jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, NPAD, 2, 64)) * 5).astype(jnp.float32)

    ref = np.asarray(_attention_xla(q[:, :NV], k[:, :NV], v[:, :NV]))

    for impl in ("xla", "blockwise"):
        out = np.asarray(
            scaled_dot_product_attention(q, k, v, impl=impl, kv_valid=NV)
        )
        np.testing.assert_allclose(out[:, :NV], ref, atol=1e-4, rtol=1e-4, err_msg=impl)

    out = np.asarray(_attention_blockwise(q, k, v, block_k=64, kv_valid=NV))
    np.testing.assert_allclose(out[:, :NV], ref, atol=1e-4, rtol=1e-4)

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        out = np.asarray(
            FA._flash_forward(q, k, v, 64, 128, kv_valid=jnp.int32(NV))
        )
    np.testing.assert_allclose(out[:, :NV], ref, atol=1e-4, rtol=1e-4)

    # gradients flow through the masked flash path (blockwise-recompute VJP);
    # the loss covers only valid query rows (padded-query outputs are
    # discarded downstream, exactly as in bucketed serving)
    def loss(q, k, v):
        out = FA.flash_attention(q, k, v, kv_valid=jnp.int32(NV))
        return jnp.sum(out[:, :NV] ** 2)

    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    # reference grads on the valid slice via unpadded attention
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(_attention_xla(q, k, v) ** 2), argnums=(0, 1, 2)
    )(q[:, :NV], k[:, :NV], v[:, :NV])
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(g[i][:, :NV]), np.asarray(g_ref[i]), atol=1e-2, rtol=2e-2
        )
    # masked keys/values receive zero gradient
    assert np.abs(np.asarray(g[1][:, NV:])).max() == 0.0
    assert np.abs(np.asarray(g[2][:, NV:])).max() == 0.0


def test_flash_fused_backward_ragged_and_lse():
    """Fused Pallas backward vs XLA autodiff on shapes that force both q and
    k padding, plus the saved-LSE contract (lse == logsumexp of scaled
    scores)."""
    from omnivggt_tpu.ops.pallas import flash_attention as FA
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(17)
    B, N, H, D = 2, 333, 2, 64  # 333: pads to 384 (bq=64) / 384 (bk=128)
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    ]
    orig = pl.pallas_call
    interp = mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )

    with interp:
        out, lse = FA._flash_forward(q, k, v, 64, 128, return_lse=True)
    scores = np.einsum("bqhd,bkhd->bhqk", q, k) * (D**-0.5)
    lse_ref = np.log(np.exp(scores - scores.max(-1, keepdims=True)).sum(-1)) \
        + scores.max(-1)
    np.testing.assert_allclose(
        np.asarray(lse).reshape(B, H, N), lse_ref, atol=1e-4, rtol=1e-5
    )

    def loss_flash(q, k, v):
        return jnp.sum(FA.flash_attention(q, k, v, 64, 128) ** 3)

    def loss_ref(q, k, v):
        return jnp.sum(_attention_xla(q, k, v) ** 3)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with interp:
        g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ref, g):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3, err_msg=name
        )


def test_qlinear_int8_exact_on_integer_grid():
    """W8A8 exactness property: when activations and weights already sit on
    their int8 quantisation grids (max|.| maps to 127), qlinear_int8 equals
    the fp32 linear bit-for-bit bar the final dtype cast."""
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, size=(4, 32)).astype(np.float32)
    x[:, 0] = 127.0  # pin every row max so ax exactly scales the int grid
    w = rng.integers(-127, 128, size=(32, 16)).astype(np.float32)
    w[0, :] = 127.0
    b = rng.normal(size=(16,)).astype(np.float32)
    p = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    got = np.asarray(L.qlinear_int8(p, jnp.asarray(x)))
    want = x @ w + b
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_qlinear_int8_close_and_batched():
    """Random-data error stays at the 8-bit quantisation level, on both 2D
    and 3D (batched tokens) inputs, in fp32 and bf16."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 48)).astype(np.float32) * 0.05
    b = rng.normal(size=(48,)).astype(np.float32) * 0.01
    p = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    for shape in ((8, 64), (2, 5, 64)):
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(dt)
            got = np.asarray(L.qlinear_int8(p, x)).astype(np.float32)
            want = np.asarray(L.linear(p, x)).astype(np.float32)
            assert got.dtype == want.dtype and got.shape == want.shape
            scale = np.abs(want).max()
            assert np.abs(got - want).max() < 0.03 * scale + 1e-4


def test_flash_attention_packed_parity():
    """Token-major packed-heads kernel vs XLA attention: unmasked, static
    kv_valid, dynamic kv_valid, bounded and running-max softmax — plus a
    ragged query count (pad rows sliced off)."""
    from omnivggt_tpu.ops.pallas.flash_attention import flash_attention_packed
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(17)
    B, N, H, D = 3, 107, 4, 16
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    ]

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        for bounded in (False, True):
            for kv in (None, 77, jnp.asarray(77, jnp.int32)):
                out = np.asarray(
                    flash_attention_packed(
                        q, k, v, kv_valid=kv, bounded_logits=bounded
                    )
                )
                kv_ref = int(kv) if kv is not None else None
                ref = np.asarray(_attention_xla(q, k, v, kv_valid=kv_ref))
                np.testing.assert_allclose(out, ref, atol=2e-5)

    # D=128 exercises the non-fold branch (head_dim == lane tile: separate
    # p@v matmul + explicit row sum instead of the ones-column fold), which
    # packed_eligible admits but the D<128 cases above never reach
    q, k, v = [
        jnp.asarray(rng.normal(size=(1, 45, 2, 128)).astype(np.float32))
        for _ in range(3)
    ]
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        for bounded in (False, True):
            out = np.asarray(
                flash_attention_packed(q, k, v, bounded_logits=bounded)
            )
            ref = np.asarray(_attention_xla(q, k, v))
            np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_attention_packed_gradient_routes_head_major():
    """AD through the packed wrapper uses the head-major forward + fused
    backward (the packed kernel is forward-only): gradients match XLA
    autodiff, including with kv_valid masking."""
    from omnivggt_tpu.ops.pallas.flash_attention import flash_attention_packed
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(19)
    q, k, v = [
        jnp.asarray(rng.normal(size=(1, 96, 2, 32)).astype(np.float32))
        for _ in range(3)
    ]

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        for kv in (None, 70):
            def loss_ref(q, k, v):
                return jnp.sum(_attention_xla(q, k, v, kv_valid=kv) ** 2)

            def loss_packed(q, k, v):
                return jnp.sum(
                    flash_attention_packed(q, k, v, kv_valid=kv) ** 2
                )

            g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
            g_pk = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
            for a, b in zip(g_ref, g_pk):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
                )


def test_flash_attention_packed_stream_parity():
    """Token-major STREAMING kernel (global-attention shapes) vs XLA
    attention: unmasked with a ragged key axis, dynamic kv_valid, and the
    int8 score-matmul variant (bounded softmax only — the kernel's
    contract)."""
    from omnivggt_tpu.ops.pallas.flash_attention import (
        _flash_packed_stream_forward,
        flash_attention_packed_stream,
    )
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(23)
    B, N, H, D = 2, 300, 4, 64  # 300 % 128 != 0: ragged final key block
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32)) * 0.5
        for _ in range(3)
    ]

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        for kv in (None, 211):
            ref = np.asarray(_attention_xla(q, k, v, kv_valid=kv))
            kv_t = jnp.asarray(kv, jnp.int32) if kv is not None else None
            out = np.asarray(
                flash_attention_packed_stream(q, k, v, 64, 128, kv_valid=kv_t)
            )
            np.testing.assert_allclose(out, ref, atol=2e-5)
            out8 = np.asarray(
                _flash_packed_stream_forward(
                    q, k, v, 64, 128, kv_valid=kv_t, qk_int8=True
                )
            )
            # int8 grid: per-head max-abs scales bound the quantisation
            # noise; same tolerance class as the head-major int8 tests
            np.testing.assert_allclose(out8, ref, atol=5e-3)
            # the valid-prefix contract: masked rows == dropping the tail
            if kv is not None:
                ref_drop = np.asarray(_attention_xla(q, k[:, :kv], v[:, :kv]))
                np.testing.assert_allclose(out, ref_drop, atol=2e-5)


def test_flash_attention_packed_stream_gradient_routes_head_major():
    """AD through the streaming wrapper uses the head-major forward + fused
    backward (the streaming kernel is forward-only): gradients match XLA
    autodiff, including with kv_valid masking."""
    from omnivggt_tpu.ops.pallas.flash_attention import (
        flash_attention_packed_stream,
    )
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(29)
    q, k, v = [
        jnp.asarray(rng.normal(size=(1, 160, 2, 64)).astype(np.float32)) * 0.5
        for _ in range(3)
    ]

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        for kv in (None, 130):
            def loss_ref(q, k, v):
                return jnp.sum(_attention_xla(q, k, v, kv_valid=kv) ** 2)

            def loss_stream(q, k, v):
                return jnp.sum(
                    flash_attention_packed_stream(q, k, v, kv_valid=kv) ** 2
                )

            g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
            g_st = jax.grad(loss_stream, argnums=(0, 1, 2))(q, k, v)
            for a, b in zip(g_ref, g_st):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
                )


def test_conv3x3_folded_parity():
    """Pallas W-folded 3x3 conv vs the XLA conv: exact up to fp32 reduction
    order, with and without the fused ReLU, at f=2 (cout 64) and f=4
    (cout 32), W divisible and not divisible by f, odd H."""
    from omnivggt_tpu.ops.pallas.conv3x3 import (
        conv3x3_eligible,
        conv3x3_folded,
    )
    import functools
    from unittest import mock
    import jax.experimental.pallas as pl

    rng = np.random.default_rng(23)
    orig = pl.pallas_call
    cases = [
        (2, 24, 22, 64, 32, False),   # f=4, W%f=2 (pad cols), even H
        (1, 16, 18, 128, 64, True),   # f=2, W%f=0, fused relu
        (1, 13, 10, 16, 8, True),     # odd H (rb=13), tiny channels, f=4
    ]
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        for B, H, W, cin, cout, relu in cases:
            x = jnp.asarray(
                rng.normal(size=(B, H, W, cin)).astype(np.float32)
            )
            p = {
                "w": jnp.asarray(
                    rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
                    * 0.1
                ),
                "b": jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)),
            }
            assert conv3x3_eligible(x.shape, p["w"].shape)
            out = np.asarray(conv3x3_folded(p, x, relu=relu))
            ref = L.conv2d(p, x, padding=((1, 1), (1, 1)))
            if relu:
                ref = jax.nn.relu(ref)
            np.testing.assert_allclose(out, np.asarray(ref), atol=2e-5)

    # ineligibility: 3x3 only; cout >= 128 already fills the MXU lanes
    assert not conv3x3_eligible((1, 12, 10, 16), (1, 1, 16, 8))
    assert not conv3x3_eligible((1, 12, 10, 128), (3, 3, 128, 128))


def test_attention_dispatch_score_bytes_cap():
    """Shapes whose materialised fp32 scores exceed _XLA_MAX_SCORE_BYTES
    must never resolve to "xla": at S=96 the DINO attention's
    f32[96,16,1376,1374] score tensor (11.09 GB) OOMed the 15.75 GB chip
    (round 5) because the sublane-pad static K slice defeats XLA's
    fused-attention rewrite. On TPU these route to the head-major flash
    kernel; off-TPU to the blockwise streaming softmax."""
    from omnivggt_tpu.ops import attention as A

    # S=96 frame/DINO shapes: 96*16*1374^2*4 = 11.06e9 > 8e9 cap
    assert A.resolve_impl((96, 1374, 16, 64)) != "xla"
    assert A.resolve_impl((96, 1376, 16, 64)) != "xla"
    # S=64 stays xla (7.37e9 under the cap; XLA measured 2x the kernels)
    assert A.resolve_impl((64, 1374, 16, 64)) == "xla"
    assert A.resolve_impl((8, 1374, 16, 64)) in ("flash", "xla")

    # the escape hatch must not reach the packed kernel: its bounded
    # variant's 232-row q blocks VMEM-OOM at B>=64 (measured), so
    # eligibility is row-capped and big-row shapes take head-major flash
    assert not A.packed_eligible((96, 1374, 16, 64), 1374)
    assert not A.packed_eligible((64, 1374, 16, 64), 1374)
    if A._PACKED_ATTN:
        assert A.packed_eligible((8, 1374, 16, 64), 1374)


def test_mismatched_static_kv_reroutes_off_xla():
    """A static valid-prefix that shortens K below q's length must bypass
    xla attention at rows > _FLASH_MAX_ROWS (the sliced-K pattern defeats
    XLA's fused-attention rewrite in-model — S=64 trace: 34 ms/layer
    materialised vs ~17 flash; S=96: 11.09 GB OOM). Equal-length q/k and
    small-row shapes keep their current dispatch."""
    from unittest import mock

    from omnivggt_tpu.ops import attention as A

    with mock.patch.object(A.jax, "default_backend", return_value="tpu"):
        # S=64 DINO: q N=1376, K valid prefix 1374, rows=1024 -> reroute
        assert A.mismatched_xla_reroutes((64, 1376, 16, 64), 1374)
        # equal length (frame attention) fuses in-model -> keep xla
        assert not A.mismatched_xla_reroutes((64, 1374, 16, 64), 1374)
        # small rows never reach this path via resolve_impl, and the
        # predicate itself is row-gated
        assert not A.mismatched_xla_reroutes((8, 1376, 16, 64), 1374)
    # off-TPU (CPU tests, tiny models): never reroutes
    assert not A.mismatched_xla_reroutes((64, 1376, 16, 64), 1374)
