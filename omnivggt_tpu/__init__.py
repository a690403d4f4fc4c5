"""omnivggt_tpu — a TPU-native (JAX / XLA / Pallas / pjit) multi-view 3D reconstruction
framework with the capabilities of OmniVGGT (reference: /root/reference).

Feed-forward multi-view 3D reconstruction: given S RGB images of a scene (plus optional
per-frame auxiliary camera poses/intrinsics and depth maps), a single jit-compiled forward
pass predicts per frame: camera pose (translation + quaternion + FoV), a dense depth map
with confidence, and a dense world-space point map with confidence.

Top-level API (mirrors the reference's public surface, see SURVEY.md §3.5):

    from omnivggt_tpu import OmniVGGT, load_images_and_cameras
    from omnivggt_tpu.utils.geometry import pose_encoding_to_extri_intri

    model = OmniVGGT()                       # config + randomly-initialised params
    model = OmniVGGT.from_safetensors(path)  # converted reference checkpoint
    preds = model(images, extrinsics=..., intrinsics=..., depth=..., mask=...,
                  depth_gt_index=[...], camera_gt_index=[...])
"""

from omnivggt_tpu.config import (
    AggregatorConfig,
    CameraHeadConfig,
    DPTHeadConfig,
    OmniVGGTConfig,
)


def __getattr__(name):
    # lazy: keep `import omnivggt_tpu.utils.geometry` cheap (no model imports)
    if name == "OmniVGGT":
        from omnivggt_tpu.models.omnivggt import OmniVGGT

        return OmniVGGT
    if name == "AuxInputs":
        from omnivggt_tpu.models.aggregator import AuxInputs

        return AuxInputs
    if name == "InferenceSession":
        from omnivggt_tpu.serving import InferenceSession

        return InferenceSession
    if name == "load_images_and_cameras":
        from omnivggt_tpu.data.loader import load_images_and_cameras

        return load_images_and_cameras
    if name == "load_and_preprocess_images":
        from omnivggt_tpu.data.loader import load_and_preprocess_images

        return load_and_preprocess_images
    if name == "serve":
        from omnivggt_tpu.serving import serve

        return serve
    if name == "SceneDataset":
        from omnivggt_tpu.data.dataset import SceneDataset

        return SceneDataset
    if name == "ShardedSampleStream":
        from omnivggt_tpu.data.streaming import ShardedSampleStream

        return ShardedSampleStream
    raise AttributeError(name)

__version__ = "0.1.0"

__all__ = [
    "AggregatorConfig",
    "CameraHeadConfig",
    "DPTHeadConfig",
    "OmniVGGTConfig",
    "OmniVGGT",
]
