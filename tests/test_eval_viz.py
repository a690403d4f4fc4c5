"""Trajectory eval, GLB export, viewer payload, sky masking, io helpers."""

import json
import os
import struct

import numpy as np
import pytest

import jax.numpy as jnp

from omnivggt_tpu.eval import trajectory as T
from omnivggt_tpu.utils import geometry as G
from omnivggt_tpu.utils import io as IO
from omnivggt_tpu.utils.pytree import collate_with_cat, select_first_batch
from omnivggt_tpu.utils.validation import ValidationError, validate_batch, guard_predictions


def _random_c2w(n=8, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :3] = np.asarray(G.quat_to_mat(jnp.asarray(q)))
    poses[:, :3, 3] = rng.normal(size=(n, 3)) * 2
    return poses


def test_ate_zero_for_identical():
    c2w = _random_c2w()
    m = T.eval_metrics(c2w, c2w)
    assert m["ate_rmse"] < 1e-6
    assert m["rpe_trans_rmse"] < 1e-6
    assert m["rpe_rot_rmse_deg"] < 1e-3


def test_ate_scale_invariance():
    """Sim3 alignment: a scaled/rotated/translated copy has ~zero ATE."""
    c2w = _random_c2w(seed=1)
    transformed = c2w.copy()
    transformed[:, :3, 3] = 2.5 * c2w[:, :3, 3] + np.array([1.0, -2.0, 3.0])
    assert T.ate_rmse(transformed, c2w) < 1e-5


def test_pose_auc_perfect():
    c2w = _random_c2w(seed=2)
    auc = T.pose_auc(c2w, c2w)
    for v in auc.values():
        assert v > 0.98


def test_traj_loaders(tmp_path):
    c2w = _random_c2w(5, seed=3)
    # replica format: flattened rows
    rep = tmp_path / "traj.txt"
    np.savetxt(rep, c2w[:, :3].reshape(5, 12))
    poses, ts = T.load_traj(str(rep), "replica", skip=1, stride=2)
    np.testing.assert_allclose(poses[:, :3], c2w[1::2, :3], atol=1e-6)

    # tum format roundtrip
    tum = tmp_path / "traj.tum"
    T.save_trajectory_tum_format(c2w, str(tum))
    poses, ts = T.load_traj(str(tum), "tum")
    np.testing.assert_allclose(poses, c2w, atol=2e-4)


def test_plot_and_metrics_files(tmp_path):
    c2w = _random_c2w(10, seed=4)
    noisy = c2w.copy()
    noisy[:, :3, 3] += 0.01
    out = T.plot_trajectory(noisy, c2w, filename=str(tmp_path / "traj.png"))
    assert os.path.getsize(out) > 1000

    m = T.eval_metrics(noisy, c2w)
    mfile = tmp_path / "seq1_eval_metric.txt"
    T.write_metrics_file(m, str(mfile), seq="seq1")
    ate, rt, rr = T.extract_metrics(str(mfile))
    assert abs(ate - m["ate_rmse"]) < 1e-5
    results = T.process_directory(str(tmp_path))
    assert len(results) == 1 and results[0][0] == "seq1"
    avgs = T.calculate_averages(results)
    assert abs(avgs[0] - m["ate_rmse"]) < 1e-5


def _fake_predictions(S=3, H=14, W=14, seed=5):
    rng = np.random.default_rng(seed)
    c2w = _random_c2w(S, seed=seed)
    return {
        "world_points": rng.normal(size=(S, H, W, 3)).astype(np.float32),
        "world_points_conf": rng.uniform(1, 10, size=(S, H, W)).astype(np.float32),
        "depth": rng.uniform(0.5, 5, size=(S, H, W, 1)).astype(np.float32),
        "depth_conf": rng.uniform(1, 10, size=(S, H, W)).astype(np.float32),
        "images": rng.uniform(size=(S, H, W, 3)).astype(np.float32),
        "extrinsic": np.linalg.inv(c2w)[:, :3].astype(np.float32),
        "intrinsic": np.tile(
            np.array([[20.0, 0, 7], [0, 20, 7], [0, 0, 1]], np.float32), (S, 1, 1)
        ),
        "world_points_from_depth": rng.normal(size=(S, H, W, 3)).astype(np.float32),
    }


def _parse_glb(path):
    with open(path, "rb") as f:
        magic, ver, total = struct.unpack("<III", f.read(12))
        assert magic == 0x46546C67 and ver == 2
        jlen, jtype = struct.unpack("<II", f.read(8))
        assert jtype == 0x4E4F534A
        gltf = json.loads(f.read(jlen))
        blen, btype = struct.unpack("<II", f.read(8))
        assert btype == 0x004E4942
        payload = f.read(blen)
        assert len(payload) == blen == gltf["buffers"][0]["byteLength"]
    return gltf


def test_glb_export_modes(tmp_path):
    from omnivggt_tpu.viz.glb import predictions_to_glb

    preds = _fake_predictions()
    p1 = predictions_to_glb(preds, str(tmp_path / "a.glb"), conf_thres=25.0)
    g = _parse_glb(p1)
    assert len(g["meshes"]) == 1 + 3  # points + 3 camera frusta
    assert g["meshes"][0]["primitives"][0]["mode"] == 0

    predictions_to_glb(
        preds, str(tmp_path / "b.glb"), conf_thres=0.0,
        prediction_mode="Depth", mask_black_bg=True, mask_white_bg=True,
        filter_by_frames="1: frame", show_cam=False,
    )
    g2 = _parse_glb(str(tmp_path / "b.glb"))
    assert len(g2["meshes"]) == 1


def test_viewer_payload_roundtrip():
    from omnivggt_tpu.viz.server import build_payload, camera_wire_segments

    preds = _fake_predictions()
    segs, cols = camera_wire_segments(preds["extrinsic"], 1.0)
    pts = preds["world_points"].reshape(-1, 3)
    n = len(pts)
    payload = build_payload(
        pts, np.zeros((n, 3), np.uint8), np.ones(n, np.float32),
        np.zeros(n, np.float32), 3, segs, cols,
    )
    N, S, nl = struct.unpack("<III", payload[:12])
    assert N == n and S == 3 and nl == len(segs)
    off = 12
    got = np.frombuffer(payload[off : off + n * 12], np.float32).reshape(n, 3)
    np.testing.assert_array_equal(got, pts)


def test_sky_heuristic():
    from omnivggt_tpu.viz.sky import _hsv_sky_mask

    img = np.zeros((40, 40, 3), np.uint8)
    img[:20] = [135, 206, 250]  # light blue "sky"
    img[20:] = [60, 40, 20]  # dark ground
    mask = _hsv_sky_mask(img)
    assert mask[5:15, 5:35].mean() < 100  # sky rows marked 0
    assert mask[25:, :].mean() > 200  # ground rows kept 255


def test_io_helpers(tmp_path):
    rng = np.random.default_rng(6)
    IO.save_focals(rng.uniform(100, 300, size=(4, 1)), str(tmp_path / "f.txt"))
    assert np.loadtxt(tmp_path / "f.txt").shape == (4,)

    K = rng.normal(size=(4, 3, 3))
    IO.save_intrinsics(K, str(tmp_path / "K.txt"))
    np.testing.assert_allclose(np.loadtxt(tmp_path / "K.txt").reshape(4, 3, 3), K, atol=1e-5)

    conf = rng.uniform(size=(2, 8, 8)).astype(np.float32)
    IO.save_conf_maps(conf, str(tmp_path))
    np.testing.assert_array_equal(np.load(tmp_path / "conf_0.npy"), conf[0])

    IO.save_depth_maps(rng.uniform(size=(2, 8, 8)).astype(np.float32), str(tmp_path))
    assert (tmp_path / "_depth_maps.gif").exists()


def test_pytree_helpers():
    samples = [
        {"a": np.ones((2, 3)), "b": [np.zeros(4)], "name": f"s{i}"} for i in range(3)
    ]
    batch = collate_with_cat(samples)
    assert batch["a"].shape == (6, 3)
    assert batch["name"] == ["s0", "s1", "s2"] or isinstance(batch["name"], list)

    preds = {"pose_enc": np.ones((2, 3, 9)), "depth": np.ones((2, 3, 4, 4, 1)), "other": 5}
    first = select_first_batch(preds)
    assert first["pose_enc"].shape == (1, 3, 9)
    assert first["other"] == 5


def test_validation():
    rng = np.random.default_rng(7)
    imgs = rng.uniform(size=(1, 2, 28, 28, 3)).astype(np.float32)
    validate_batch(imgs, patch_size=14)  # ok

    with pytest.raises(ValidationError, match="multiples"):
        validate_batch(rng.uniform(size=(1, 2, 30, 30, 3)).astype(np.float32))

    bad = imgs.copy()
    bad[0, 0, 0, 0, 0] = np.nan
    with pytest.raises(ValidationError, match="NaN"):
        validate_batch(bad)

    with pytest.raises(ValidationError, match="out of range"):
        validate_batch(imgs, camera_gt_index=[5])

    probs = guard_predictions({"x": np.array([1.0, np.inf])})
    assert probs and "Inf" in probs[0]


def test_onnx_sky_path_parity_with_reference(tmp_path):
    """Drive the ONNX sky-mask code path with a stub session and assert it
    reproduces the reference pipeline (visual_util.py:422-490: 320x320 resize,
    BGR->RGB, ImageNet standardisation, min-max -> uint8, resize back,
    threshold < 32 -> 255) byte-for-byte, so the path can't rot while the
    real skyseg.onnx is unavailable in this image."""
    import cv2

    from tests.reference_util import install_reference, reference_available
    from omnivggt_tpu.viz.sky import _onnx_sky_mask

    if not reference_available():
        import pytest

        pytest.skip("reference tree not mounted")
    install_reference()
    import visual_util as ref_vu

    captured = {}

    class _Tensor:
        def __init__(self, name):
            self.name = name

    class StubSession:
        """Deterministic u2net stand-in: saliency = channel mean of the
        normalised input, so sky-ish (bright, low-texture) regions score
        differently from the rest and the <32 threshold is exercised."""

        def get_inputs(self):
            return [_Tensor("input")]

        def get_outputs(self):
            return [_Tensor("output")]

        def run(self, out_names, feeds):
            x = feeds["input"]
            captured["shape"] = x.shape
            captured["dtype"] = x.dtype
            sal = x.mean(axis=1, keepdims=True)  # (1,1,320,320)
            return [sal]

    img_path = "/root/reference/example/office/images/frame-000002.png"
    ours = _onnx_sky_mask(img_path, StubSession())

    assert captured["shape"] == (1, 3, 320, 320)
    assert captured["dtype"] == np.float32

    ref_mask_file = str(tmp_path / "masks" / "m.png")
    ref = ref_vu.segment_sky(img_path, StubSession(), ref_mask_file)

    assert ours.shape == ref.shape
    assert set(np.unique(ours)) <= {0, 255}
    # the threshold must actually split the image (both classes present)
    assert 0 < (ours == 255).mean() < 1
    np.testing.assert_array_equal(ours, ref)


def _indep_traj_metrics(pred, gt):
    """Independent evaluator, coded from evo's published definitions (Umeyama
    1991 alignment; APE translation rmse; RPE delta-1 frames with
    align+correct_scale, matching the reference's evo flags at
    /root/reference/omnivggt/utils/vo_eval.py:189-234). Cross-checks
    eval/trajectory.py, which is written differently."""
    x, y = pred[:, :3, 3], gt[:, :3, 3]
    n = len(x)
    mx, my = x.mean(0), y.mean(0)
    sig2 = np.mean(np.sum((x - mx) ** 2, axis=1))
    Sigma = (y - my).T @ (x - mx) / n
    U, d, Vt = np.linalg.svd(Sigma)
    S = np.eye(3)
    if np.linalg.det(Sigma) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    c = np.trace(np.diag(d) @ S) / sig2
    t = my - c * R @ mx

    al = pred.copy()
    al[:, :3, 3] = (c * (R @ x.T)).T + t
    al[:, :3, :3] = np.einsum("ab,nbc->nac", R, pred[:, :3, :3])
    ate = np.sqrt(np.mean(np.sum((al[:, :3, 3] - y) ** 2, -1)))
    te, re = [], []
    for i in range(n - 1):
        rel_q = np.linalg.inv(gt[i]) @ gt[i + 1]
        rel_p = np.linalg.inv(al[i]) @ al[i + 1]
        E = np.linalg.inv(rel_q) @ rel_p
        te.append(np.linalg.norm(E[:3, 3]))
        re.append(np.degrees(np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1))))
    return ate, np.sqrt(np.mean(np.square(te))), np.sqrt(np.mean(np.square(re)))


def _golden_trajectories():
    def rotz(a):
        ca, sa = np.cos(a), np.sin(a)
        return np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1.0]])

    rng = np.random.default_rng(42)
    N = 20
    gt = np.tile(np.eye(4), (N, 1, 1))
    for i in range(N):
        a = 0.15 * i
        gt[i, :3, :3] = rotz(a)
        gt[i, :3, 3] = [np.cos(a) * 3, np.sin(a) * 3, 0.1 * i]
    S = np.eye(4)
    S[:3, :3] = 1.7 * rotz(0.4)
    S[:3, 3] = [5.0, -2.0, 1.0]
    pred = np.einsum("ab,nbc->nac", S, gt)
    pred[:, :3, 3] += 0.05 * rng.standard_normal((N, 3))
    for i in range(N):
        w = 0.02 * rng.standard_normal(3)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        dR = np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * (K @ K)
        pred[i, :3, :3] = dR @ pred[i, :3, :3]
    return pred, gt


def test_trajectory_metrics_vs_independent_goldens():
    """eval_metrics pinned two ways: against an independent in-test evaluator
    on the same synthetic trajectory, and against hardcoded golden values (so
    both implementations drifting together still trips the test)."""
    from omnivggt_tpu.eval.trajectory import eval_metrics

    pred, gt = _golden_trajectories()
    m = eval_metrics(pred, gt)
    iate, irt, irr = _indep_traj_metrics(pred, gt)
    np.testing.assert_allclose(m["ate_rmse"], iate, rtol=1e-9)
    np.testing.assert_allclose(m["rpe_trans_rmse"], irt, rtol=1e-9)
    np.testing.assert_allclose(m["rpe_rot_rmse_deg"], irr, rtol=1e-9)

    # goldens computed once from the independent implementation
    np.testing.assert_allclose(m["ate_rmse"], 0.03892494162221198, rtol=1e-8)
    np.testing.assert_allclose(m["rpe_trans_rmse"], 0.19103070978155992, rtol=1e-8)
    np.testing.assert_allclose(m["rpe_rot_rmse_deg"], 2.1256200360273634, rtol=1e-8)


def test_trajectory_metrics_sim3_invariance():
    """align=True + correct_scale=True makes the metrics invariant to any
    global Sim(3) applied to the prediction (the property evo's aligned RPE
    has and an unaligned RPE does not)."""
    from omnivggt_tpu.eval.trajectory import eval_metrics

    pred, gt = _golden_trajectories()
    m0 = eval_metrics(pred, gt)
    ang, scale, shift = 1.1, 0.33, np.array([-7.0, 0.5, 3.0])
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]]
    )
    pred2 = pred.copy()
    pred2[:, :3, 3] = scale * pred[:, :3, 3] @ R.T + shift
    pred2[:, :3, :3] = np.einsum("ab,nbc->nac", R, pred[:, :3, :3])
    m1 = eval_metrics(pred2, gt)
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-7, err_msg=k)


class _FakeOnnxSession:
    """Duck-typed onnxruntime.InferenceSession: emits a 320x320 map that is
    high (sky) in the top half, low (ground) in the bottom half."""

    class _IO:
        name = "io"

    def get_outputs(self):
        return [self._IO()]

    def get_inputs(self):
        return [self._IO()]

    def run(self, out_names, feeds):
        x = feeds["io"]
        assert x.shape == (1, 3, 320, 320) and x.dtype == np.float32
        out = np.zeros((1, 1, 320, 320), np.float32)
        out[..., :160, :] = 1.0  # top half = sky
        return [out]


def test_sky_onnx_branch(tmp_path, monkeypatch):
    """The reference-compatible ONNX path (visual_util.py:453-490 semantics:
    normalised output < 32 -> non-sky 255) runs end-to-end through
    sky_masks_for_folder, including the PNG cache."""
    import cv2

    from omnivggt_tpu.viz import sky

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = np.full((64, 48, 3), 128, np.uint8)
    cv2.imwrite(str(img_dir / "a.png"), img)

    monkeypatch.setattr(sky, "_get_onnx_session", lambda: _FakeOnnxSession())
    masks = sky.sky_masks_for_folder(
        str(img_dir), (64, 48), cache_dir=str(tmp_path / "cache")
    )
    assert masks.shape == (1, 64, 48)
    assert (masks[0, :28] == 0).all()  # sky rows
    assert (masks[0, 36:] == 255).all()  # ground rows
    # cached PNG round-trips without the session
    monkeypatch.setattr(sky, "_get_onnx_session", lambda: None)
    again = sky.sky_masks_for_folder(
        str(img_dir), (64, 48), cache_dir=str(tmp_path / "cache")
    )
    np.testing.assert_array_equal(masks, again)


def test_sky_onnx_env_model_path(tmp_path, monkeypatch):
    """OMNIVGGT_SKYSEG_ONNX points _get_onnx_session at the model file; with
    onnxruntime absent it degrades to None (HSV fallback) silently."""
    from omnivggt_tpu.viz import sky

    monkeypatch.setenv("OMNIVGGT_SKYSEG_ONNX", str(tmp_path / "nope.onnx"))
    assert sky._get_onnx_session() is None


def test_sky_onnx_branch_with_stub_runtime(tmp_path, monkeypatch):
    """The reference-default ONNX sky path (visual_util.py:453-490 semantics:
    320x320 imagenet-normalised NCHW input, min-max rescale, <32 -> non-sky)
    executes end-to-end against a stubbed onnxruntime, including the PNG
    cache short-circuit. Keeps the never-run-in-this-image branch tested."""
    import sys
    import types

    import cv2

    from omnivggt_tpu.viz import sky

    H, W = 40, 48
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = np.zeros((H, W, 3), np.uint8)
    img[: H // 2] = [200, 220, 255]  # top half "sky"
    img[H // 2 :] = [60, 40, 20]
    for name in ("a.png", "b.png"):
        cv2.imwrite(str(img_dir / name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    calls = []

    class _FakeSession:
        def __init__(self, path):
            calls.append(("init", path))

        def get_inputs(self):
            return [types.SimpleNamespace(name="input.1")]

        def get_outputs(self):
            return [types.SimpleNamespace(name="out")]

        def run(self, out_names, feeds):
            x = feeds["input.1"]
            calls.append(("run", x.shape, x.dtype))
            # u2net-style contract: (1, 3, 320, 320) fp32, imagenet-normalised
            assert x.shape == (1, 3, 320, 320) and x.dtype == np.float32
            # sky (bright blue) pixels normalise positive, ground negative
            assert x.max() > 0 and x.min() < 0
            sal = np.zeros((1, 1, 320, 320), np.float32)
            sal[:, :, :160] = 1.0  # model says: top half is sky
            return [sal]

    fake = types.ModuleType("onnxruntime")
    fake.InferenceSession = _FakeSession
    monkeypatch.setitem(sys.modules, "onnxruntime", fake)
    model = tmp_path / "skyseg.onnx"
    model.write_bytes(b"fake")
    monkeypatch.setenv("OMNIVGGT_SKYSEG_ONNX", str(model))

    cache = tmp_path / "cache"
    masks = sky.sky_masks_for_folder(
        str(img_dir), (H, W), cache_dir=str(cache)
    )
    assert masks.shape == (2, H, W)
    n_runs = sum(1 for c in calls if c[0] == "run")
    assert n_runs == 2  # the ONNX branch ran, once per image
    # saliency>=32 (sky) -> 0, <32 -> 255 non-sky, resized back to H x W
    assert masks[0, : H // 4].mean() < 32
    assert masks[0, 3 * H // 4 :].mean() > 223
    # PNGs cached per image; a second call serves from cache, no new runs
    assert sorted(p.name for p in (cache / "sky_masks").iterdir()) == [
        "a.png", "b.png",
    ]
    again = sky.sky_masks_for_folder(str(img_dir), (H, W), cache_dir=str(cache))
    assert sum(1 for c in calls if c[0] == "run") == n_runs
    np.testing.assert_array_equal(masks, again)

    # without the model file the session is None and the HSV fallback runs
    monkeypatch.setenv("OMNIVGGT_SKYSEG_ONNX", str(tmp_path / "missing.onnx"))
    assert sky._get_onnx_session() is None
