"""Batch inference serving: bucketing session + HTTP endpoint."""

import io
import json
import socket
import urllib.request

import numpy as np
import pytest

from omnivggt_tpu.config import tiny_test_config
from omnivggt_tpu.models.omnivggt import OmniVGGT
from omnivggt_tpu.serving import InferenceSession, serve


@pytest.fixture(scope="module")
def session():
    return InferenceSession(
        OmniVGGT(tiny_test_config()), buckets=(2, 4), pad_mode="exact"
    )


def test_session_exact_mode_matches_direct_forward(session):
    """pad_mode='exact': serving results == a direct model call."""
    rng = np.random.default_rng(0)
    imgs3 = rng.uniform(size=(3, 28, 28, 3)).astype(np.float32)
    out = session.infer(imgs3)
    assert out["pose_enc"].shape == (3, 9)
    assert out["depth"].shape == (3, 28, 28, 1)
    assert (3, 28, 28, False, False, False, 1) in session._jitted

    direct = session.model(imgs3)
    np.testing.assert_allclose(
        out["pose_enc"], np.asarray(direct["pose_enc"])[0], atol=1e-6
    )


def test_session_bucketing():
    session = InferenceSession(
        OmniVGGT(tiny_test_config()), buckets=(2, 4), pad_mode="bucket"
    )
    rng = np.random.default_rng(0)
    imgs3 = rng.uniform(size=(3, 28, 28, 3)).astype(np.float32)
    out = session.infer(imgs3)
    # padded to bucket 4 internally, stripped back to 3 frames
    assert out["pose_enc"].shape == (3, 9)
    assert list(session._jitted) == [(4, 28, 28, False, False, True, 1)]

    # a second 4-frame request reuses the compiled bucket
    # an exact-fit 4-frame request uses the unmasked executable (no
    # per-tile masking pass) under the same bucket
    out4 = session.infer(rng.uniform(size=(4, 28, 28, 3)).astype(np.float32))
    assert out4["pose_enc"].shape == (4, 9)
    assert (4, 28, 28, False, False, False, 1) in session._jitted
    assert len(session._jitted) == 2


def test_session_with_aux(session):
    rng = np.random.default_rng(1)
    imgs = rng.uniform(size=(2, 28, 28, 3)).astype(np.float32)
    ex = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    K = np.tile(np.diag([30.0, 30.0, 1.0]).astype(np.float32), (2, 1, 1))
    K[:, 0, 2] = K[:, 1, 2] = 14
    out = session.infer(
        imgs, extrinsics=ex, intrinsics=K,
        depth=np.ones((2, 28, 28, 1), np.float32),
        mask=np.ones((2, 28, 28), np.float32),
        camera_gt_index=[0], depth_gt_index=[0, 1],
    )
    assert np.isfinite(out["world_points"]).all()


def test_session_rejects_bad_input(session):
    with pytest.raises(Exception, match="multiples|images"):
        session.infer(np.zeros((2, 30, 30, 3), np.float32))


def test_http_endpoint(session):
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    httpd, thread = serve(session, port=port, background=True)
    try:
        health = json.loads(
            urllib.request.urlopen(f"http://localhost:{port}/healthz", timeout=10).read()
        )
        assert health["status"] == "ok"

        rng = np.random.default_rng(2)
        buf = io.BytesIO()
        np.savez(buf, images=rng.uniform(size=(2, 28, 28, 3)).astype(np.float32))
        req = urllib.request.Request(
            f"http://localhost:{port}/infer", data=buf.getvalue(), method="POST"
        )
        resp = urllib.request.urlopen(req, timeout=120)
        assert resp.headers["X-Inference-Seconds"]
        preds = np.load(io.BytesIO(resp.read()))
        assert preds["pose_enc"].shape == (2, 9)
        assert preds["depth_conf"].shape == (2, 28, 28)

        # malformed request -> structured 400
        bad = urllib.request.Request(
            f"http://localhost:{port}/infer", data=b"not-an-npz", method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()


def test_bucketed_equals_exact():
    """The default bucket mode masks padded frames out of every cross-frame
    attention, so a 3-frame scene served through the 4-bucket must match the
    exact (unpadded) forward — images-only AND with aux modalities."""
    model = OmniVGGT(tiny_test_config())
    bucketed = InferenceSession(model, buckets=(4,), pad_mode="bucket")
    exact = InferenceSession(model, buckets=(4,), pad_mode="exact")
    assert InferenceSession(model).pad_mode == "bucket"  # the default

    rng = np.random.default_rng(5)
    imgs = rng.uniform(size=(3, 28, 28, 3)).astype(np.float32)

    out_b = bucketed.infer(imgs)
    out_e = exact.infer(imgs)
    assert list(bucketed._jitted) == [(4, 28, 28, False, False, True, 1)]
    for k in out_e:
        assert out_b[k].shape == out_e[k].shape, k
        np.testing.assert_allclose(
            out_b[k], out_e[k], atol=2e-5, rtol=1e-5, err_msg=k
        )

    # with camera + depth injection on a subset of frames
    ex = np.tile(np.eye(3, 4, dtype=np.float32), (3, 1, 1))
    ex[:, :3, 3] = rng.normal(size=(3, 3))
    K = np.tile(np.diag([30.0, 30.0, 1.0]).astype(np.float32), (3, 1, 1))
    K[:, 0, 2] = K[:, 1, 2] = 14
    depth = rng.uniform(0.5, 3.0, size=(3, 28, 28, 1)).astype(np.float32)
    msk = np.ones((3, 28, 28), np.float32)
    kw = dict(extrinsics=ex, intrinsics=K, depth=depth, mask=msk,
              camera_gt_index=[0, 2], depth_gt_index=[1])
    out_b = bucketed.infer(imgs, **kw)
    out_e = exact.infer(imgs, **kw)
    for k in out_e:
        np.testing.assert_allclose(
            out_b[k], out_e[k], atol=2e-5, rtol=1e-5, err_msg=k
        )


def test_infer_batch_stacks_compatible_scenes():
    """Compatible scenes share ONE batched executable; results match the
    single-scene path exactly."""
    session = InferenceSession(
        OmniVGGT(tiny_test_config()), buckets=(2, 4), pad_mode="exact"
    )
    rng = np.random.default_rng(7)
    scenes = [
        {"images": rng.uniform(size=(2, 28, 28, 3)).astype(np.float32)}
        for _ in range(3)
    ]
    odd = {"images": rng.uniform(size=(3, 28, 28, 3)).astype(np.float32)}
    outs = session.infer_batch(scenes + [odd])
    assert len(outs) == 4
    # one B=3 executable for the trio, one B=1 for the odd scene
    assert (2, 28, 28, False, False, False, 3) in session._jitted
    assert (3, 28, 28, False, False, False, 1) in session._jitted
    singles = [session.infer(**s) for s in scenes]
    for got, want in zip(outs[:3], singles):
        for k in want:
            np.testing.assert_allclose(
                got[k], want[k], atol=2e-5, rtol=1e-5, err_msg=k
            )
    assert outs[3]["pose_enc"].shape == (3, 9)


def test_batcher_coalesces_concurrent_requests():
    """Concurrent submits within the window run as one batched forward."""
    import threading

    from omnivggt_tpu.serving import Batcher

    session = InferenceSession(
        OmniVGGT(tiny_test_config()), buckets=(2,), pad_mode="exact"
    )
    batcher = Batcher(session, max_batch=4, window_ms=300.0)
    rng = np.random.default_rng(8)
    imgs = [
        rng.uniform(size=(2, 28, 28, 3)).astype(np.float32) for _ in range(3)
    ]
    results = [None] * 3

    def worker(i):
        results[i] = batcher.submit(images=imgs[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    batcher.close()
    assert all(r is not None for r in results)
    # the window coalesced all three -> only a B=3 executable exists
    assert (2, 28, 28, False, False, False, 3) in session._jitted
    for i in range(3):
        want = session.infer(images=imgs[i])
        np.testing.assert_allclose(
            results[i]["pose_enc"], want["pose_enc"], atol=2e-5, rtol=1e-5
        )


def test_http_glb_endpoint_and_auth():
    session = InferenceSession(
        OmniVGGT(tiny_test_config()), buckets=(2,), pad_mode="exact"
    )
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    httpd, thread = serve(session, port=port, background=True, token="sekrit")
    try:
        rng = np.random.default_rng(9)
        buf = io.BytesIO()
        np.savez(
            buf,
            images=rng.uniform(size=(2, 28, 28, 3)).astype(np.float32),
            conf_thres=np.float32(10.0),
        )
        # unauthenticated -> 401
        req = urllib.request.Request(
            f"http://localhost:{port}/infer_glb", data=buf.getvalue(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=120)
            raise AssertionError("expected HTTP 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        # authenticated -> a valid GLB binary
        req = urllib.request.Request(
            f"http://localhost:{port}/infer_glb", data=buf.getvalue(),
            method="POST", headers={"Authorization": "Bearer sekrit"},
        )
        resp = urllib.request.urlopen(req, timeout=300)
        body = resp.read()
        assert resp.headers["Content-Type"] == "model/gltf-binary"
        assert body[:4] == b"glTF"
    finally:
        httpd.shutdown()


def test_compressed_trunk_matches_within_tolerance():
    """bf16 trunk weight storage barely changes inference: the trunk casts
    every weight to the bf16 activation dtype at use; the only deltas come
    from XLA's allow-excess-precision folding of the convert chains
    (<= ~1e-5, see checkpoint.cast_trunk_params)."""
    model = OmniVGGT(tiny_test_config())
    plain = InferenceSession(model, buckets=(2,), pad_mode="exact")
    compressed = InferenceSession(
        model, buckets=(2,), pad_mode="exact", compress_trunk=True
    )
    import jax.numpy as jnp

    agg = compressed.model.params["aggregator"]
    assert agg["frame_blocks"]["attn"]["qkv"]["w"].dtype == jnp.bfloat16
    assert agg["patch_embed"]["proj"]["w"].dtype == jnp.bfloat16
    # LayerNorm params are consumed at fp32 and must stay fp32
    assert agg["frame_blocks"]["norm1"]["scale"].dtype == jnp.float32
    if "q_norm" in agg["frame_blocks"]["attn"]:
        assert (
            agg["frame_blocks"]["attn"]["q_norm"]["scale"].dtype == jnp.float32
        )

    rng = np.random.default_rng(11)
    imgs = rng.uniform(size=(2, 28, 28, 3)).astype(np.float32)
    a = plain.infer(imgs)
    b = compressed.infer(imgs)
    for k in a:
        # the camera head's 4-iteration nonlinear refinement amplifies the
        # ~1e-5 trunk delta under RANDOM weights (chaotic feedback); dense
        # outputs see the raw delta
        tol = 2e-2 if k.startswith("pose_enc") else 1e-4
        np.testing.assert_allclose(a[k], b[k], atol=tol, rtol=tol, err_msg=k)


def test_bucket_mode_rejects_ring_sharding():
    """Ring strategies cannot mask padded frames; bucket mode must refuse them
    at construction instead of crashing at trace time."""
    import jax

    from omnivggt_tpu.parallel.mesh import make_mesh
    from omnivggt_tpu.parallel.sharding import ModelSharding

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sharding = ModelSharding(make_mesh(data=1, seq=8), global_attn="ring")
    with pytest.raises(ValueError, match="ring"):
        InferenceSession(OmniVGGT(tiny_test_config()), sharding=sharding)
    # exact mode with ring sharding stays allowed
    InferenceSession(
        OmniVGGT(tiny_test_config()), sharding=sharding, pad_mode="exact"
    )


def test_batcher_timeout_on_wedged_backend(session, monkeypatch):
    """A hanging device dispatch (the documented axon-tunnel wedge) delivers
    InferenceTimeout to the submitting thread instead of blocking forever;
    a healthy dispatch under the same timeout succeeds (VERDICT r3 item 4)."""
    import threading
    import time as _time

    from omnivggt_tpu.serving import Batcher, InferenceTimeout

    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(2, 28, 28, 3)).astype(np.float32)

    # healthy path under a generous deadline
    batcher = Batcher(session, window_ms=1.0)
    out = batcher.submit(timeout=120.0, images=imgs)
    assert out["pose_enc"].shape == (2, 9)

    # wedge _execute: submit must raise within ~the deadline
    release = threading.Event()

    def wedged_execute(reqs):
        release.wait(30.0)
        raise RuntimeError("never reached in a passing test")

    monkeypatch.setattr(session, "_execute", wedged_execute)
    t0 = _time.monotonic()
    with pytest.raises(InferenceTimeout):
        batcher.submit(timeout=0.3, images=imgs)
    assert _time.monotonic() - t0 < 5.0
    release.set()  # unwedge the daemon dispatch thread
    batcher.close()


def test_session_deadline_wrapper(session, monkeypatch):
    """_call_with_deadline bounds the non-batched serving path the same way."""
    import time as _time

    from omnivggt_tpu.serving import InferenceTimeout, _call_with_deadline

    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(2, 28, 28, 3)).astype(np.float32)
    out = _call_with_deadline(session.infer, 120.0, images=imgs)
    assert out["pose_enc"].shape == (2, 9)

    def hang(**kwargs):
        _time.sleep(30)

    with pytest.raises(InferenceTimeout):
        _call_with_deadline(hang, 0.2, images=imgs)

    # errors inside the deadline propagate as themselves
    def boom(**kwargs):
        raise ValueError("bad scene")

    with pytest.raises(ValueError, match="bad scene"):
        _call_with_deadline(boom, 5.0, images=imgs)


def test_backend_probe_states(monkeypatch):
    """BackendProbe: ok on a live backend, wedged when the probe hangs past
    its deadline, and /healthz-compatible dict shape throughout."""
    import threading
    import time as _time

    from omnivggt_tpu.serving import BackendProbe

    ok = BackendProbe(interval_s=60.0, timeout_s=5.0)
    # first call may report unknown while the probe thread runs; poll briefly
    for _ in range(100):
        st = ok.status()
        if st["backend"] != "unknown":
            break
        _time.sleep(0.05)
    assert st["backend"] == "ok"
    # fresh verdicts are served from cache (no second probe thread)
    assert ok.status()["backend"] == "ok"

    hang = threading.Event()
    wedged = BackendProbe(interval_s=60.0, timeout_s=0.2)
    monkeypatch.setattr(
        BackendProbe, "_probe_once",
        staticmethod(lambda: hang.wait(30.0)),
    )
    wedged.status()  # launches the hanging probe
    _time.sleep(0.3)
    assert wedged.status()["backend"] == "wedged"
    hang.set()


def test_http_timeout_returns_503():
    """A wedged backend surfaces as HTTP 503 on /infer, and /healthz reports
    degraded instead of hanging."""
    import threading
    import time as _time

    from omnivggt_tpu.serving import BackendProbe, InferenceSession, serve

    session = InferenceSession(
        OmniVGGT(tiny_test_config()), buckets=(2,), pad_mode="exact"
    )
    release = threading.Event()
    session._execute = lambda reqs: (release.wait(30.0), [])[1]

    probe = BackendProbe(interval_s=60.0, timeout_s=0.2)
    probe._probe_once = staticmethod(lambda: release.wait(30.0))

    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    httpd, thread = serve(
        session, port=port, background=True, request_timeout_s=0.3,
        probe=probe,
    )
    try:
        rng = np.random.default_rng(0)
        buf = io.BytesIO()
        np.savez(buf, images=rng.uniform(size=(2, 28, 28, 3)).astype(np.float32))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/infer", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=10)
        assert exc.value.code == 503
        assert "InferenceTimeout" in json.loads(exc.value.read())["error"]

        probe.status()  # launch the hanging liveness probe
        _time.sleep(0.3)
        with pytest.raises(urllib.error.HTTPError) as hexc:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10
            )
        assert hexc.value.code == 503
        assert json.loads(hexc.value.read())["backend"] == "wedged"
    finally:
        release.set()
        httpd.shutdown()


def test_warmup_precompiles_buckets():
    """warmup() compiles exactly the executables later traffic hits — a
    warmed session serves new scene sizes without growing the jit cache."""
    session = InferenceSession(
        OmniVGGT(tiny_test_config()), buckets=(2, 4), pad_mode="bucket"
    )
    keys = session.warmup(frame_counts=(4,), hw=(28, 28))
    # exact-fit (unmasked) + traced-num_valid masked executables, bucket 4
    assert set(keys) == {
        (4, 28, 28, False, False, False, 1),
        (4, 28, 28, False, False, True, 1),
    }
    assert set(session._jitted) == set(keys)

    rng = np.random.default_rng(0)
    session.infer(rng.uniform(size=(3, 28, 28, 3)).astype(np.float32))
    session.infer(rng.uniform(size=(4, 28, 28, 3)).astype(np.float32))
    assert set(session._jitted) == set(keys)  # no new compiles


def test_warmup_skips_gapless_masked_bucket():
    """Bucket 2 over (1, 2) can never receive a padded scene (S=1 routes to
    bucket 1), so warmup must not compile a masked executable for it."""
    session = InferenceSession(
        OmniVGGT(tiny_test_config()), buckets=(1, 2), pad_mode="bucket"
    )
    keys = session.warmup(frame_counts=(1, 2), hw=(28, 28))
    assert set(keys) == {
        (1, 28, 28, False, False, False, 1),
        (2, 28, 28, False, False, False, 1),
    }


def test_warmup_modalities_and_batch_sizes():
    """(camera_gt, depth_gt) combos and Batcher stack sizes each warm their
    own executable; warmed aux traffic then hits the cache."""
    session = InferenceSession(
        OmniVGGT(tiny_test_config()), buckets=(2,), pad_mode="bucket"
    )
    keys = session.warmup(
        frame_counts=(2,), hw=(28, 28), batch_sizes=(1, 2),
        include_masked=False, modalities=((True, True),),
    )
    assert set(keys) == {
        (2, 28, 28, True, True, False, 1),
        (2, 28, 28, True, True, False, 2),
    }

    rng = np.random.default_rng(1)
    ex = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    K = np.tile(np.diag([30.0, 30.0, 1.0]).astype(np.float32), (2, 1, 1))
    K[:, 0, 2] = K[:, 1, 2] = 14
    session.infer(
        rng.uniform(size=(2, 28, 28, 3)).astype(np.float32),
        extrinsics=ex, intrinsics=K,
        depth=np.ones((2, 28, 28, 1), np.float32),
        mask=np.ones((2, 28, 28), np.float32),
        camera_gt_index=[0], depth_gt_index=[0],
    )
    assert len(session._jitted) == 2  # still only the warmed executables


def test_healthz_answers_before_warmup_finishes():
    """The port binds and /healthz reports alive-but-warming (200) for the
    whole warmup compile window, so orchestrator startup probes don't kill
    the process mid-compile; inference POSTs 503 until warmup clears, and
    after it the probe flips to ok/ready."""
    import threading

    session = InferenceSession(
        OmniVGGT(tiny_test_config()), buckets=(2,), pad_mode="exact"
    )
    release = threading.Event()
    real_warmup = session.warmup

    def slow_warmup(**kw):
        assert release.wait(30.0)
        return real_warmup(**kw)

    session.warmup = slow_warmup

    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]

    result = {}

    def run():
        result["ret"] = serve(
            session, port=port, background=True, warmup_frame_counts=(2,)
        )

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        # poll until the socket accepts (bind happens before warmup)
        deadline = 10.0
        import time as _time

        t0 = _time.time()
        health = None
        while _time.time() - t0 < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5
                ) as r:
                    health = json.loads(r.read())
                break
            except (urllib.error.URLError, ConnectionError):
                _time.sleep(0.05)
        assert health is not None, "port never bound during warmup"
        assert health["status"] == "warming" and health["ready"] is False

        buf = io.BytesIO()
        rng = np.random.default_rng(0)
        np.savez(buf, images=rng.uniform(size=(2, 28, 28, 3)).astype(np.float32))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/infer", data=buf.getvalue(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=10)
        assert exc.value.code == 503
        assert "warming" in json.loads(exc.value.read())["error"]
    finally:
        release.set()
    t.join(timeout=120)
    assert not t.is_alive()
    httpd, _ = result["ret"]
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["ready"] is True
        # warmed executable serves traffic normally now
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 200
    finally:
        httpd.shutdown()
