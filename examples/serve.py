"""Serving quick start: start the inference server and round-trip a request.

    python examples/serve.py [checkpoint.safetensors]      # real model
    python examples/serve.py --tiny                        # CPU demo

Starts the HTTP endpoint (omnivggt_tpu/serving.py) with request batching,
posts a scene as .npz to /infer, prints the returned prediction shapes, then
fetches a GLB export from /infer_glb. The reference has no serving story —
this is the framework's production path: bucketed compilation (a handful of
executables serve any frame count), cross-request batching, bearer auth.
"""

import io
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omnivggt_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import numpy as np  # noqa: E402


def main():
    from omnivggt_tpu.config import tiny_test_config
    from omnivggt_tpu.models.omnivggt import OmniVGGT
    from omnivggt_tpu.serving import InferenceSession, serve

    if "--tiny" in sys.argv:
        model = OmniVGGT(tiny_test_config())
        size = 28
    elif len(sys.argv) > 1:
        model = OmniVGGT.from_safetensors(sys.argv[1])
        size = 518
    else:
        raise SystemExit(__doc__)

    session = InferenceSession(
        model, buckets=(2, 4, 8, 16), compress_trunk=True
    )
    httpd, _ = serve(
        session, port=0, background=True, token="demo", batch_window_ms=4.0
    )
    port = httpd.server_address[1]
    print(f"server on :{port}")

    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    np.savez(buf, images=rng.uniform(size=(3, size, size, 3)).astype(np.float32))
    req = urllib.request.Request(
        f"http://localhost:{port}/infer", data=buf.getvalue(), method="POST",
        headers={"Authorization": "Bearer demo"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        preds = np.load(io.BytesIO(resp.read()))
        print(f"inference {resp.headers['X-Inference-Seconds']}s:")
        for k in preds.files:
            print(f"  {k}: {preds[k].shape}")

    req = urllib.request.Request(
        f"http://localhost:{port}/infer_glb", data=buf.getvalue(),
        method="POST", headers={"Authorization": "Bearer demo"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        glb = resp.read()
    assert glb[:4] == b"glTF"
    print(f"GLB export: {len(glb)} bytes")
    httpd.shutdown()


if __name__ == "__main__":
    main()
