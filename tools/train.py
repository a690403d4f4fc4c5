"""Training CLI — the runnable driver for the training subsystem.

The reference never released training code (README.md:201-205); this drives
the framework's full stack on real data: scene datasets (example-layout /
ScanNet / CO3D roots, data/dataset.py) or pre-sharded streaming tars
(data/streaming.py), the sharded modality-injection train step
(train/step.py), the layer-decay fine-tune optimizer (train/optim.py),
metric logging, and checkpoint save/resume (train/checkpointing.py).

    # fine-tune on a folder of scenes, single device
    python tools/train.py --data_root scenes/ --steps 1000 \
        --checkpoint OmniVGGT.safetensors --ckpt_dir runs/ft

    # smoke-run on CPU with the tiny config and a 2-way sequence mesh
    # (--data_root batches are B=1, so the data axis must be 1 and the seq
    # axis must divide --views)
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/train.py --data_root /root/reference/example --tiny \
        --steps 3 --views 2 --target_size 28 --mesh 1,2

    # stream pre-built shards (tools-side: data.streaming.write_shards)
    python tools/train.py --shards 'shards/shard-*.tar' --steps 10000 ...
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omnivggt_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--data_root", help="root of scene folders")
    src.add_argument("--shards", help="glob of streaming tar shards")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--views", type=int, default=4, help="views per sample")
    ap.add_argument("--batch", type=int, default=1,
                    help="scenes per batch (shards mode)")
    ap.add_argument("--target_size", type=int, default=518)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU smoke runs)")
    ap.add_argument("--checkpoint", help="init from OmniVGGT .safetensors")
    ap.add_argument("--ckpt_dir", default="runs/default")
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--layer_decay", type=float, default=0.9)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--drop_path", type=float, default=0.0)
    ap.add_argument("--mesh", help="data,seq device mesh (e.g. 1,8)")
    ap.add_argument("--state_sharding", default="none",
                    choices=("none", "zero2", "fsdp"),
                    help="ZeRO-style state sharding over the mesh: zero2 "
                         "shards grads + AdamW moments, fsdp also shards "
                         "params (required for the 1.2B flagship, whose "
                         "replicated fp32 state is 19.5 GB/chip)")
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import dataclasses

    import jax
    import numpy as np

    from omnivggt_tpu.config import OmniVGGTConfig, tiny_test_config
    from omnivggt_tpu.models import omnivggt as M
    from omnivggt_tpu.train.checkpointing import resume_or_init, save_train_state
    from omnivggt_tpu.train.optim import make_finetune_optimizer
    from omnivggt_tpu.train.step import init_state, make_train_step
    from omnivggt_tpu.utils.logging import MetricLogger

    cfg = tiny_test_config() if args.tiny else OmniVGGTConfig()
    if args.drop_path > 0:
        cfg = dataclasses.replace(
            cfg,
            aggregator=dataclasses.replace(
                cfg.aggregator, drop_path_rate=args.drop_path
            ),
        )

    if args.checkpoint:
        from omnivggt_tpu.checkpoint import load_safetensors_params
        from omnivggt_tpu.models.omnivggt import _certify_bounded_logits

        params = load_safetensors_params(args.checkpoint, cfg)
        # the fixed-max flash softmax must be re-certified against THESE
        # weights (same check the OmniVGGT loading wrappers apply)
        cfg = _certify_bounded_logits(cfg, params)
    else:
        params = M.init(jax.random.PRNGKey(args.seed), cfg)

    sharding = None
    if args.mesh:
        from omnivggt_tpu.parallel.mesh import make_mesh
        from omnivggt_tpu.parallel.sharding import ModelSharding

        data_ax, seq_ax = (int(x) for x in args.mesh.split(","))
        batch_dim = 1 if args.data_root else args.batch
        if batch_dim % data_ax:
            raise SystemExit(
                f"mesh data axis {data_ax} must divide the batch size "
                f"{batch_dim} (--data_root mode always yields batch 1: "
                f"use --mesh 1,N)"
            )
        if args.views % seq_ax:
            raise SystemExit(
                f"mesh seq axis {seq_ax} must divide --views {args.views}"
            )
        sharding = ModelSharding(make_mesh(data=data_ax, seq=seq_ax))

    optimizer = make_finetune_optimizer(
        params,
        learning_rate=args.lr,
        layer_decay=args.layer_decay,
        warmup_steps=args.warmup,
        total_steps=args.steps,
    )
    if args.state_sharding != "none" and sharding is None:
        raise SystemExit("--state_sharding requires --mesh")
    train_step = make_train_step(
        cfg, optimizer, sharding,
        use_aux_inputs=True, remat=not args.no_remat, seed=args.seed,
        state_sharding=args.state_sharding,
    )
    state = resume_or_init(args.ckpt_dir, init_state(params, optimizer))
    start = int(state.step)
    if start:
        print(f"resumed from {args.ckpt_dir} at step {start}")
    if sharding is not None:
        # a restored state sits on one device; lay it out over the mesh —
        # fully replicated (the classic DDP layout), or ZeRO-sharded so the
        # moments (and params, under fsdp) never materialise replicated
        from jax.sharding import NamedSharding, PartitionSpec

        if args.state_sharding != "none":
            from omnivggt_tpu.parallel import fsdp

            state = jax.device_put(
                state,
                fsdp.state_shardings(
                    jax.eval_shape(lambda: state),
                    sharding.mesh, args.state_sharding,
                ),
            )
        else:
            state = jax.device_put(
                state, NamedSharding(sharding.mesh, PartitionSpec())
            )

    if args.data_root:
        from omnivggt_tpu.data.dataset import SceneDataset, prefetch

        ds = SceneDataset(
            args.data_root,
            views_per_sample=args.views,
            target_size=args.target_size,
            seed=args.seed,
        )
        print(f"{len(ds)} scene(s) under {args.data_root}")
        batches = prefetch(ds.batches())
    else:
        from omnivggt_tpu.data.streaming import (
            ShardedSampleStream, batch_stream,
        )

        stream = ShardedSampleStream(
            args.shards, shuffle_buffer=64, seed=args.seed
        )
        batches = batch_stream(stream, args.batch)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    logger = MetricLogger(
        jsonl_path=os.path.join(args.ckpt_dir, "metrics.jsonl")
    )
    t0 = time.perf_counter()
    last_logged = start
    for step, batch in zip(range(start, args.steps), batches):
        if sharding is not None:
            from omnivggt_tpu.parallel.mesh import shard_batch

            batch = shard_batch(sharding.mesh, batch)
        state, metrics = train_step(state, batch)
        if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
            metrics = {k: float(v) for k, v in metrics.items()}
            dt = (time.perf_counter() - t0) / (step + 1 - last_logged)
            t0, last_logged = time.perf_counter(), step + 1
            logger.update(step=step + 1, sec_per_step=round(dt, 3), **metrics)
            print(f"step {step + 1}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in sorted(metrics.items())
            ))
        if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
            path = save_train_state(args.ckpt_dir, state)
            print(f"saved {path}")


if __name__ == "__main__":
    main()
