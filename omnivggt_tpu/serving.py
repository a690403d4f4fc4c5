"""Batch inference serving.

A minimal production-style serving layer over the jit-compiled model:

  - `InferenceSession`: owns params + a cache of compiled forwards keyed on
    (bucketed S, H, W, modality combo). The default pad_mode="bucket" pads the
    frame count up to the next bucket so a handful of compilations serve
    arbitrary scene sizes; padded frames are masked out of every cross-frame
    attention (num_valid_frames plumbed through the model), so bucketed
    results match the unpadded forward exactly (up to reduction-order float
    noise, < 1e-5). pad_mode="exact" compiles one executable per distinct
    frame count instead.
  - `serve()`: a stdlib HTTP endpoint — POST /infer with an .npz body
    (images [+ extrinsics/intrinsics/depth/mask + camera_gt_index/
    depth_gt_index]) returns an .npz of predictions. GET /healthz for liveness.

The reference has no serving story (single CLI process); this is the
framework-level replacement.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler
from socketserver import ThreadingTCPServer
from typing import Dict, Optional, Sequence

import numpy as np


DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


class InferenceSession:
    """Thread-safe scene-inference session with frame-count bucketing."""

    def __init__(self, model=None, config=None, params=None,
                 buckets: Sequence[int] = DEFAULT_BUCKETS, sharding=None,
                 pad_mode: str = "bucket"):
        from omnivggt_tpu.models.omnivggt import OmniVGGT

        if model is None:
            model = OmniVGGT(config) if params is None else OmniVGGT(config, params)
        if pad_mode not in ("exact", "bucket"):
            raise ValueError(f"pad_mode must be 'exact' or 'bucket', got {pad_mode}")
        if (
            pad_mode == "bucket"
            and sharding is not None
            and getattr(sharding, "global_attn", None) in ("ring", "ring_fused")
        ):
            raise ValueError(
                "bucket mode masks padded frames out of attention, which the "
                "ring strategies do not support; use "
                "ModelSharding(..., global_attn='allgather') or "
                "pad_mode='exact'"
            )
        self.model = model
        self.buckets = tuple(sorted(buckets))
        self.sharding = sharding
        self.pad_mode = pad_mode
        self._lock = threading.Lock()
        self._jitted: Dict = {}

    def _bucket(self, S: int) -> int:
        if self.pad_mode == "exact":
            return S
        for b in self.buckets:
            if S <= b:
                return b
        return S

    def infer(
        self,
        images: np.ndarray,
        extrinsics=None,
        intrinsics=None,
        depth=None,
        mask=None,
        camera_gt_index: Optional[Sequence[int]] = None,
        depth_gt_index: Optional[Sequence[int]] = None,
    ) -> Dict[str, np.ndarray]:
        """images: (S, H, W, 3) float [0,1]. Returns numpy predictions with
        the padding frames stripped."""
        import jax
        import jax.numpy as jnp

        from omnivggt_tpu.models import omnivggt as M
        from omnivggt_tpu.models.omnivggt import make_aux
        from omnivggt_tpu.utils.validation import validate_batch

        images = np.asarray(images, np.float32)
        if images.ndim != 4:
            raise ValueError(f"images must be (S,H,W,3); got {images.shape}")
        S, H, W, _ = images.shape

        def batched(x, shape):
            if x is None:
                return None
            x = np.asarray(x)
            return x.reshape(shape)[None] if x.size == np.prod(shape) else x[None]

        validate_batch(
            images[None],
            batched(extrinsics, (S, 3, 4)),
            batched(intrinsics, (S, 3, 3)),
            batched(depth, (S, H, W, 1)),
            batched(mask, (S, H, W)),
            depth_gt_index,
            camera_gt_index,
            patch_size=self.model.config.patch_size,
        )

        Sb = self._bucket(S)
        pad = Sb - S

        def pad_frames(x, fill=0.0):
            if x is None or pad == 0:
                return x
            x = np.asarray(x)
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, widths, constant_values=fill)

        imgs = pad_frames(images)[None]
        aux = make_aux(
            Sb,
            None if extrinsics is None else pad_frames(np.asarray(extrinsics).reshape(S, 3, 4))[None],
            None if intrinsics is None else pad_frames(np.asarray(intrinsics).reshape(S, 3, 3))[None],
            None if depth is None else pad_frames(np.asarray(depth).reshape(S, H, W, 1))[None],
            None if mask is None else pad_frames(np.asarray(mask).reshape(S, H, W))[None],
            depth_gt_index,
            camera_gt_index,
        )
        has_cam = aux is not None and aux.camera_mask is not None
        has_depth = aux is not None and aux.depth_mask is not None
        # exact-fit requests (pad == 0) run the unmasked executable: no
        # per-tile masking pass, identical to exact mode. Padded requests run
        # the masked executable, whose num_valid_frames is a *traced* scalar
        # so one compilation serves every S < bucket.
        masked = self.pad_mode == "bucket" and pad > 0
        key = (Sb, H, W, has_cam, has_depth, masked)

        with self._lock:
            if key not in self._jitted:
                cfg = self.model.config
                sharding = self.sharding

                if masked:
                    @jax.jit
                    def fwd(params, images, aux, nv):
                        return M.apply(
                            params, images, cfg, aux, sharding=sharding,
                            num_valid_frames=nv,
                        )
                else:
                    @jax.jit
                    def fwd(params, images, aux):
                        return M.apply(
                            params, images, cfg, aux, sharding=sharding
                        )

                self._jitted[key] = fwd
            fwd = self._jitted[key]

        if masked:
            preds = fwd(
                self.model.params, jnp.asarray(imgs), aux, jnp.int32(S)
            )
        else:
            preds = fwd(self.model.params, jnp.asarray(imgs), aux)
        out = {}
        for k, v in preds.items():
            arr = np.asarray(v)
            if k == "pose_enc_list":
                arr = arr[:, 0, :S]
            elif arr.ndim >= 2 and arr.shape[0] == 1:
                arr = arr[0, :S]
            out[k] = arr
        return out


def serve(session: InferenceSession, port: int = 8000, background: bool = False):
    """POST /infer (npz body) -> npz predictions; GET /healthz -> JSON."""

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") == "/healthz" or self.path == "/":
                body = json.dumps(
                    {"status": "ok", "buckets": session.buckets,
                     "compiled": [list(k) for k in session._jitted]}
                ).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"{}", "application/json")

        def do_POST(self):
            if self.path.rstrip("/") != "/infer":
                self._send(404, b"{}", "application/json")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                data = np.load(io.BytesIO(self.rfile.read(n)), allow_pickle=False)
                kwargs = {k: data[k] for k in data.files}
                for idx_key in ("camera_gt_index", "depth_gt_index"):
                    if idx_key in kwargs:
                        kwargs[idx_key] = [int(i) for i in kwargs[idx_key]]
                t0 = time.time()
                preds = session.infer(**kwargs)
                dt = time.time() - t0
                buf = io.BytesIO()
                np.savez(buf, **preds)
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("X-Inference-Seconds", f"{dt:.3f}")
                body = buf.getvalue()
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001 — report to the client
                body = json.dumps({"error": f"{type(e).__name__}: {e}"}).encode()
                self._send(400, body, "application/json")

        def log_message(self, *a):
            pass

    httpd = ThreadingTCPServer(("0.0.0.0", port), Handler)
    httpd.daemon_threads = True
    print(f"inference server on :{port} (POST /infer, GET /healthz)")
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd, t
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()
    return httpd, None
