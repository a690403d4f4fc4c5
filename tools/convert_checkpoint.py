"""Convert a reference OmniVGGT safetensors checkpoint to this framework's
native format (orbax params + config JSON).

Usage:
    python tools/convert_checkpoint.py checkpoints/OmniVGGT.safetensors out_dir/

The conversion consumes every tensor in the state dict exactly once (the
functional equivalent of the reference's strict=True load) and fails loudly on
anything missing or unexpected.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    src, dst = sys.argv[1], sys.argv[2]

    from omnivggt_tpu.utils.platform import ensure_platform

    ensure_platform()

    from omnivggt_tpu.config import OmniVGGTConfig
    from omnivggt_tpu.models.omnivggt import OmniVGGT

    print(f"converting {src} ...")
    model = OmniVGGT.from_safetensors(src, OmniVGGTConfig())
    model.save_pretrained(dst)
    n_params = sum(x.size for x in __import__("jax").tree.leaves(model.params))
    print(f"saved {dst} ({n_params/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
