"""Training checkpoint save / resume (orbax-backed).

The reference only has dead epoch-checkpoint boilerplate
(/root/reference/omnivggt/datasets/utils/misc.py:295-331); this is the working
TPU-native equivalent: the full TrainState (params + optimiser state + step)
round-trips through orbax with sharding restored, plus a keep-last-k policy.
"""

from __future__ import annotations

import os
from typing import Optional


from omnivggt_tpu.train.step import TrainState


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(ckpt_dir: str, state: TrainState, step: Optional[int] = None,
                     keep_last: int = 3) -> str:
    """Write `{ckpt_dir}/step_{N}`; prunes old checkpoints beyond keep_last."""
    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    c = _ckptr()
    c.save(path, state, force=True)
    c.wait_until_finished()

    existing = sorted(
        d for d in os.listdir(ckpt_dir) if d.startswith("step_")
    )
    for stale in existing[:-keep_last]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, stale), ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None


def restore_train_state(path: str, like: TrainState) -> TrainState:
    """Restore with the structure/sharding of `like` (an abstract or concrete
    TrainState from init_state)."""
    restored = _ckptr().restore(path, like)
    return TrainState(*restored) if not isinstance(restored, TrainState) else restored


def resume_or_init(ckpt_dir: str, init_state: TrainState) -> TrainState:
    """Resume from the newest checkpoint in ckpt_dir, else return init_state."""
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return init_state
    return restore_train_state(path, init_state)
