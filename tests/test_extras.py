"""SwiGLU parity, training-era geometry utilities, viewer server, CLI smoke."""

import json
import struct
import subprocess
import sys
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omnivggt_tpu.ops import layers as L
from omnivggt_tpu.utils import geometry as G
from tests.reference_util import install_reference, reference_available

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@needs_ref
def test_swiglu_parity():
    install_reference()
    import torch
    from omnivggt.layers.swiglu_ffn import SwiGLUFFNFused

    torch.manual_seed(0)
    ffn = SwiGLUFFNFused(in_features=48, hidden_features=4 * 48).eval()
    x = torch.randn(2, 7, 48)
    with torch.no_grad():
        ref = ffn(x).numpy()

    hidden = L.swiglu_hidden_fused(4 * 48)
    assert ffn.w12.weight.shape[0] == 2 * hidden  # rounding matches
    p = {
        "w12": {
            "w": jnp.asarray(ffn.w12.weight.detach().numpy().T),
            "b": jnp.asarray(ffn.w12.bias.detach().numpy()),
        },
        "w3": {
            "w": jnp.asarray(ffn.w3.weight.detach().numpy().T),
            "b": jnp.asarray(ffn.w3.bias.detach().numpy()),
        },
    }
    ours = np.asarray(L.mlp(p, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ref, ours, atol=1e-5)


def test_swiglu_block_roundtrip():
    """A swiglu block initialises, runs, and is scan-stackable."""
    p = L.block_init(
        jax.random.PRNGKey(0), 32, 2, init_values=0.01, ffn_layer="swiglufused"
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, 32)).astype(np.float32))
    y = L.block(p, x, num_heads=2)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


@needs_ref
def test_normalize_pointcloud_parity():
    install_reference()
    import torch
    from omnivggt.utils.geometry import normalize_pointcloud as ref_norm

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 6, 7, 3)).astype(np.float32) * 3
    valid = rng.uniform(size=(2, 6, 7)) > 0.3

    for mode in ("avg_dis", "avg_log1p", "median_dis"):
        ref = ref_norm(
            torch.from_numpy(pts.copy()), mode, torch.from_numpy(valid)
        ).numpy()
        ours = np.asarray(
            G.normalize_pointcloud(jnp.asarray(pts), mode, jnp.asarray(valid))
        )
        np.testing.assert_allclose(ref, ours, atol=1e-4, rtol=1e-4, err_msg=mode)


@needs_ref
def test_geotrf_parity():
    install_reference()
    from omnivggt.utils.geometry import geotrf as ref_geotrf

    rng = np.random.default_rng(1)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = rng.normal(size=(3, 3))
    T[:3, 3] = rng.normal(size=3)
    pts = rng.normal(size=(5, 4, 3)).astype(np.float32)
    np.testing.assert_allclose(
        ref_geotrf(T, pts), np.asarray(G.geotrf(T, pts)), atol=1e-5
    )
    # batched (B,4,4) x (B,H,W,3)
    Tb = np.tile(T, (2, 1, 1))
    ptsb = rng.normal(size=(2, 3, 4, 3)).astype(np.float32)
    np.testing.assert_allclose(
        ref_geotrf(Tb, ptsb).reshape(2, -1, 3),
        np.asarray(G.geotrf(Tb, ptsb)).reshape(2, -1, 3),
        atol=1e-5,
    )


@needs_ref
def test_find_reciprocal_matches_parity():
    install_reference()
    from omnivggt.utils.geometry import find_reciprocal_matches as ref_match

    rng = np.random.default_rng(2)
    P1 = rng.normal(size=(40, 3))
    P2 = P1[rng.permutation(40)[:25]] + rng.normal(scale=0.01, size=(25, 3))
    r_mask, r_nn, r_n = ref_match(P1, P2)
    o_mask, o_nn, o_n = G.find_reciprocal_matches(P1, P2)
    np.testing.assert_array_equal(r_mask, o_mask)
    np.testing.assert_array_equal(r_nn, o_nn)
    assert r_n == o_n


def test_viewer_server_roundtrip():
    from omnivggt_tpu.viz.server import serve_scene

    rng = np.random.default_rng(3)
    S, H, W = 2, 6, 7
    c2w = np.tile(np.eye(4), (S, 1, 1))
    c2w[:, :3, 3] = rng.normal(size=(S, 3))
    preds = {
        "world_points": rng.normal(size=(S, H, W, 3)).astype(np.float32),
        "world_points_conf": rng.uniform(1, 5, size=(S, H, W)).astype(np.float32),
        "images": rng.uniform(size=(S, H, W, 3)).astype(np.float32),
        "extrinsic": np.linalg.inv(c2w)[:, :3].astype(np.float32),
    }
    import socket

    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    t = serve_scene(preds, port=port, background_mode=True, use_point_map=True)
    assert t is not None

    page = urllib.request.urlopen(f"http://localhost:{port}/", timeout=10).read()
    assert b"omnivggt-tpu" in page and b"webgl" in page.lower()
    # click-frustum-to-set-viewpoint handler shipped with the page
    assert b"pickCamera" in page
    data = urllib.request.urlopen(f"http://localhost:{port}/data", timeout=10).read()
    n, s_frames, nl = struct.unpack("<III", data[:12])
    assert n == S * H * W and s_frames == S and nl == S * 8  # 8 segments/camera

    # the trailing per-camera [position, view-dir] block used by the click
    # handler: walk the binary layout the page's parser uses
    off = 12 + n * 12 + n * 3
    off += (4 - off % 4) % 4
    off += n * 4 + n * 4 + nl * 24 + nl * 6
    off += (4 - off % 4) % 4
    cam_poses = np.frombuffer(data[off : off + S * 24], np.float32).reshape(S, 6)
    # identity camera rotations -> view direction (0, 0, 1) for every frame
    np.testing.assert_allclose(cam_poses[:, 3:], [[0, 0, 1]] * S, atol=1e-6)
    # recentering preserves relative camera positions
    rel_ref = c2w[1, :3, 3] - c2w[0, :3, 3]
    np.testing.assert_allclose(
        cam_poses[1, :3] - cam_poses[0, :3], rel_ref, atol=1e-5
    )
    off += S * 24

    # textured-frustum section: far-plane quads + thumbnail atlas
    # (reference parity: add_camera_frustum(..., image=img),
    #  /root/reference/inference.py:196-209)
    quads = np.frombuffer(data[off : off + S * 48], np.float32).reshape(S, 4, 3)
    off += S * 48
    assert np.isfinite(quads).all() and not np.allclose(quads, 0)
    # quad centers sit in front of the camera along its view direction
    centers = quads.mean(axis=1)
    for s in range(S):
        d = centers[s] - cam_poses[s, :3]
        assert np.dot(d, cam_poses[s, 3:]) > 0
    tw, th, cols_n, rows_n = struct.unpack("<IIII", data[off : off + 16])
    off += 16
    assert tw > 0 and th > 0 and cols_n * rows_n >= S
    atlas = np.frombuffer(
        data[off : off + rows_n * th * cols_n * tw * 3], np.uint8
    )
    off += rows_n * th * cols_n * tw * 3
    assert off == len(data)
    # frame 0's atlas cell reproduces its (nearest-subsampled) image colors
    atlas = atlas.reshape(rows_n * th, cols_n * tw, 3)
    expect = (preds["images"][0][: th, : tw] * 255).astype(np.uint8)
    np.testing.assert_array_equal(atlas[:th, :tw], expect)
    # viewer page ships the bg-mask checkboxes + textured-frustum shader
    assert b"mblack" in page and b"mwhite" in page
    assert b"texture2D" in page


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    """The inference CLI runs the tiny model on a real scene and writes a GLB."""
    glb = tmp_path / "scene.glb"
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"}
    proc = subprocess.run(
        [
            sys.executable, "inference.py", "--tiny",
            "--image_folder", "/root/reference/example/office/images",
            "--camera_folder", "/root/reference/example/office/cameras",
            "--save_glb", "--glb_path", str(glb), "--no_viewer",
        ],
        capture_output=True, text=True, timeout=540, cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert glb.exists() and glb.stat().st_size > 1000
    with open(glb, "rb") as f:
        magic, ver, _ = struct.unpack("<III", f.read(12))
    assert magic == 0x46546C67 and ver == 2


def test_log_every_streams_unsized_iterables():
    """Generators (no __len__) stream lazily — the logger must not list()
    them (infinite loaders would hang, epochs would buffer in RAM)."""
    from omnivggt_tpu.utils.logging import MetricLogger

    consumed = []

    def gen():
        for i in range(100000):
            consumed.append(i)
            yield i

    ml = MetricLogger()
    it = ml.log_every(gen(), print_freq=10, header="s")
    for _, i in zip(range(3), it):
        pass
    # lazily consumed: only the items we pulled (+ at most one lookahead)
    assert len(consumed) <= 4


def test_collate_with_cat_variable_leading_dims():
    """torch.cat reference semantics: batched arrays with different view
    counts concatenate along dim 0 (device.py:47-73)."""
    import numpy as np

    from omnivggt_tpu.utils.pytree import collate_with_cat

    a = {"images": np.zeros((2, 4, 4, 3)), "n": np.asarray(1.0, np.float32)}
    b = {"images": np.ones((3, 4, 4, 3)), "n": np.asarray(2.0, np.float32)}
    out = collate_with_cat([a, b])
    assert out["images"].shape == (5, 4, 4, 3)
    assert out["n"].shape == (2,)  # scalars stack


def test_select_first_batch_numpy_pose_enc_list():
    import numpy as np

    from omnivggt_tpu.utils.pytree import select_first_batch

    preds = {
        "pose_enc_list": np.arange(4 * 2 * 3 * 9, dtype=np.float32).reshape(4, 2, 3, 9),
        "depth": np.zeros((2, 4, 4, 1)),
    }
    out = select_first_batch(preds)
    assert "pose_enc" in out and "pose_enc_list" not in out
    np.testing.assert_array_equal(
        out["pose_enc"], preds["pose_enc_list"][-1][:1]
    )


def test_timer_section_forces_set_result():
    from omnivggt_tpu.utils.profiling import Timer, timed

    t = Timer()
    with t.section("x") as s:
        s.set([1, 2, 3])
    assert t.counts["x"] == 1 and t.totals["x"] >= 0
    with timed("y") as s:
        s.set(None)


@pytest.mark.slow
def test_validate_release_tiny(tmp_path):
    """tools/validate_release.py runs end-to-end (convert -> certify ->
    example scenes -> torch goldens -> parity gates) with converted random
    weights on the tiny architecture."""
    from tests.reference_util import install_reference, reference_available
    from tests.reference_util import torch_state_dict_to_numpy

    if not reference_available():
        pytest.skip("reference tree not mounted")
    install_reference()
    import torch
    from safetensors.numpy import save_file

    from tests.test_models import _tiny_torch_omnivggt

    torch.manual_seed(5)
    sd = torch_state_dict_to_numpy(_tiny_torch_omnivggt(torch))
    path = str(tmp_path / "tiny.safetensors")
    save_file(sd, path)

    import tools.validate_release as VR

    out = str(tmp_path / "result.json")
    rc = VR.main([path, "--arch", "tiny", "--frames", "2", "--out", out])
    assert rc == 0
    result = json.load(open(out))
    assert result["pass"]
    assert set(result["scenes"]) == {"office", "infinigen"}
    for name, sc in result["scenes"].items():
        assert sc["pass"], (name, sc)
        assert sc["pose_auc@30"] > 0.999
        assert "views_per_sec" in sc
    assert result["certified"]["head_dtype"] in ("bfloat16", "float32")
