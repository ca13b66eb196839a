"""Training command line: dataset -> fit() -> GGUF export.

The reference has no training entrypoint (ggml-opt is dormant,
SURVEY §2c); this CLI makes the training module usable end to end:

  python -m zerovox_tpu.training.cli --data data.npz --epochs 5 \\
      --batch-size 8 --val-split 0.1 --checkpoint-dir ck/ --export m.gguf

Dataset format: one .npz with the TrainBatch arrays, each carrying a
leading ndata axis —
  src_seq (N, P) int, puncts (N, P) int, style_embed (N, d_model) f32,
  num_phonemes (N,) int, durations (N, P) int (teacher forcing),
  mel_target (N, T, num_mels) f32, wav_target (N, T*hop) f32.
--synthetic N generates a random dataset at the model geometry (smoke
runs / scaling tests).

Training shards over ALL visible devices: batch DP on the "data" axis and
(with --mesh d,m) Megatron channel TP on "model"; XLA inserts the
collectives (parallel/sharding.py).  --checkpoint-dir enables orbax
resume: rerunning the same command continues from the latest step.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def load_dataset_npz(path: str, cfg) -> "TrainBatch":
    from .train import TrainBatch
    try:
        z = np.load(path)
    except (OSError, ValueError) as e:
        raise SystemExit(f"cannot read dataset {path}: {e}")
    missing = [k for k in TrainBatch._fields if k not in z]
    if missing:
        raise SystemExit(f"{path}: missing arrays {missing} "
                         f"(need {list(TrainBatch._fields)})")
    n = z["src_seq"].shape[0]
    shapes = dict(
        src_seq=(n, cfg.max_n_phonemes), puncts=(n, cfg.max_n_phonemes),
        style_embed=(n, cfg.d_model), num_phonemes=(n,),
        durations=(n, cfg.max_n_phonemes),
        mel_target=(n, cfg.max_seq_len, cfg.num_mels),
        wav_target=(n, cfg.wav_len))
    for k, want in shapes.items():
        if tuple(z[k].shape) != want:
            raise SystemExit(f"{path}: {k} has shape {z[k].shape}, "
                             f"model geometry wants {want}")
    return TrainBatch(**{k: z[k] for k in TrainBatch._fields})


def synthetic_dataset(cfg, n: int, seed: int = 0) -> "TrainBatch":
    from .train import TrainBatch
    rng = np.random.default_rng(seed)
    P = cfg.max_n_phonemes
    return TrainBatch(
        src_seq=rng.integers(1, cfg.num_phonemes, size=(n, P)).astype(np.int32),
        puncts=rng.integers(0, cfg.num_puncts, size=(n, P)).astype(np.int32),
        style_embed=rng.normal(scale=0.1, size=(n, cfg.d_model)).astype(np.float32),
        num_phonemes=np.full((n,), P, np.int32),
        durations=rng.integers(1, 4, size=(n, P)).astype(np.int32),
        mel_target=rng.normal(size=(n, cfg.max_seq_len, cfg.num_mels)).astype(np.float32),
        wav_target=rng.normal(scale=0.1, size=(n, cfg.wav_len)).astype(np.float32),
    )


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="zerovox_tpu.training",
        description="Train zerovox-tpu (teacher-forced FS2+StyleTTS+HiFiGAN)")
    src_grp = ap.add_mutually_exclusive_group(required=True)
    src_grp.add_argument("--data", help=".npz dataset (see module docstring)")
    src_grp.add_argument("--synthetic", type=int, metavar="N",
                         help="random N-datum dataset (smoke/scaling runs)")
    ap.add_argument("--init", help="GGUF checkpoint to start from "
                                   "(default: random init)")
    ap.add_argument("--tiny", action="store_true",
                    help="TINY geometry (CPU smoke; default: production)")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--val-split", type=float, default=0.0)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr-schedule", choices=("constant", "cosine"),
                    default="constant",
                    help="cosine: linear warmup then cosine decay to "
                         "lr/10 over the run's total optimizer steps")
    ap.add_argument("--warmup-steps", type=int, default=0,
                    help="linear LR warmup steps (either schedule)")
    ap.add_argument("--weight-decay", type=float, default=1e-2)
    ap.add_argument("--no-stft", action="store_true",
                    help="skip the multi-resolution STFT loss (no vocoder "
                         "gradient; much cheaper)")
    ap.add_argument("--mesh", default=None, metavar="DATA,MODEL",
                    help="device mesh split (default: all devices on data)")
    ap.add_argument("--accum", type=int, default=1, metavar="K",
                    help="gradient accumulation: scan each step's batch as "
                         "K microbatches (activation memory of batch/K "
                         "rows; ggml-opt's opt_period equivalent)")
    ap.add_argument("--checkpoint-dir",
                    help="orbax TrainState checkpoints; an existing dir "
                         "resumes from its latest step")
    ap.add_argument("--checkpoint-every", type=int, default=100,
                    help="optimizer steps between checkpoints")
    ap.add_argument("--export", help="write weights-only GGUF here at the end")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--compile-cache", metavar="DIR",
                    help="persist compiled XLA programs under DIR (a "
                         "restarted/resumed run loads the train step "
                         "instead of recompiling it)")
    args = ap.parse_args(argv)
    if args.epochs < 1:
        ap.error(f"--epochs must be >= 1 (got {args.epochs})")

    if args.compile_cache:
        from ..utils.compile_cache import enable_compile_cache
        print(f"train: compile cache "
              f"{enable_compile_cache(args.compile_cache)}", file=sys.stderr)

    import jax
    from ..config import TINY_CONFIG, ZeroVoxConfig
    from ..parallel import initialize_distributed, make_mesh, make_pod_mesh
    from .checkpoint import CheckpointManager, export_weights_gguf
    from .fit import fit, make_eval_fn
    from .train import (make_lr_schedule, make_optimizer,
                        make_sharded_train_step)

    # multi-host launch: every host runs this same command with
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set
    # (or Cloud TPU auto-discovery); must happen before any backend use
    distributed = initialize_distributed()
    if distributed:
        print(f"train: distributed process {jax.process_index()}/"
              f"{jax.process_count()}", file=sys.stderr)

    from ..params import init_params, load_params

    if args.init:
        cfg, params = load_params(args.init)
        print(f"train: initialized from {args.init}", file=sys.stderr)
    else:
        cfg = TINY_CONFIG if args.tiny else ZeroVoxConfig()
        params = init_params(cfg, seed=args.seed)

    data = (load_dataset_npz(args.data, cfg) if args.data
            else synthetic_dataset(cfg, args.synthetic, seed=args.seed))
    ndata = data.src_seq.shape[0]

    n_dev = len(jax.devices())
    if args.mesh:
        from ..parallel import parse_mesh_spec
        try:
            d, m = parse_mesh_spec(args.mesh)
        except ValueError as e:
            ap.error(str(e))
    else:
        d, m = n_dev, 1
    if distributed:
        # pod layout: data spans hosts (DCN), model stays inside one host's
        # devices (ICI-only TP collectives); data size derives from the
        # global device count, only --mesh's model part is honored
        mesh = make_pod_mesh(hosts=jax.process_count(), model=m)
        if args.mesh and mesh.shape["data"] != d:
            print(f"train: distributed mode derives the data axis from the "
                  f"global device count; --mesh data={d} ignored "
                  f"(using {mesh.shape['data']})", file=sys.stderr)
    else:
        mesh = make_mesh(data=d, model=m)
    d = mesh.shape["data"]
    if args.batch_size % d:
        raise SystemExit(f"--batch-size {args.batch_size} must divide by the "
                         f"data-axis size {d}")
    if args.accum < 1:
        raise SystemExit(f"--accum must be >= 1 (got {args.accum})")
    if args.warmup_steps < 0:
        raise SystemExit(f"--warmup-steps must be >= 0 "
                         f"(got {args.warmup_steps})")
    if args.accum > 1 and args.batch_size % (args.accum * d):
        raise SystemExit(
            f"--batch-size {args.batch_size} must divide by "
            f"accum*data = {args.accum}*{d} (each microbatch is "
            f"batch/accum rows, still sharded over the data axis)")

    use_stft = not args.no_stft
    # small geometries need STFT windows that fit their waveform
    stft_res = (((256, 30, 120), (128, 15, 60))
                if cfg.wav_len < 16384 else None)
    # the schedule horizon must match fit()'s actual step count: fit
    # splits BATCHES, not rows (fit.py: nbatches = ndata // batch;
    # train batches = int((1 - val_split) * nbatches))
    nbatches = max(1, ndata // args.batch_size)
    total_steps = max(1, int((1.0 - args.val_split) * nbatches)) * args.epochs
    lr = make_lr_schedule(args.lr, total_steps, schedule=args.lr_schedule,
                          warmup_steps=args.warmup_steps)
    optimizer = make_optimizer(lr, args.weight_decay)
    state, step = make_sharded_train_step(
        cfg, mesh, params, optimizer=optimizer, use_stft=use_stft,
        stft_resolutions=stft_res, accum_steps=args.accum)
    eval_fn = (make_eval_fn(cfg, mesh, use_stft=use_stft,
                            stft_resolutions=stft_res)
               if args.val_split > 0 else None)

    mgr = None
    if args.checkpoint_dir:
        mgr = CheckpointManager(args.checkpoint_dir)
        last = mgr.latest_step()
        if last is not None:
            state = mgr.restore(state)
            print(f"train: resumed from step {last} "
                  f"({args.checkpoint_dir})", file=sys.stderr)

    print(f"train: mesh={dict(mesh.shape)} ndata={ndata} "
          f"batch={args.batch_size} epochs={args.epochs} "
          f"val_split={args.val_split} stft={use_stft}", file=sys.stderr)
    t0 = time.time()
    try:
        state, history = fit(
            state, step, data, batch_size=args.batch_size,
            epochs=args.epochs, val_split=args.val_split, eval_fn=eval_fn,
            seed=args.seed, checkpoint_manager=mgr,
            checkpoint_every=args.checkpoint_every, silent=False)
    finally:
        if mgr is not None:
            mgr.save(state, wait=True)   # always leave a resumable state
            mgr.close()
    print(f"train: {int(state.step)} total steps, "
          f"final train loss {history[-1]['train_loss']:.6f} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    if args.export:
        export_weights_gguf(args.export, state, cfg)
        print(f"train: exported weights to {args.export}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
