"""Epoch/fit driver: the TPU-native ggml-opt dataset loop.

Mirrors ggml_opt_fit / ggml_opt_epoch
(/root/reference/ggml/src/ggml-opt.cpp:677-843): an in-memory dataset is
split into a train and a validation region, shuffled once whole before the
first epoch and train-region-only every epoch after, walked in fixed-size
physical batches (train batches step the optimizer, validation batches run
the loss-only forward), with per-batch progress callbacks and per-epoch
loss +- uncertainty reporting.

TPU-idiomatic differences (not translations):
  * one batch shape — the trailing ndata % batch_size remainder is dropped
    (ggml asserts divisibility instead) so the jitted step keeps a single
    compile key;
  * per-step losses stay ON DEVICE and are fetched once per epoch — a
    float() per step would serialize every dispatch through the ~30 ms
    tunnel round-trip;
  * checkpointing rides the step cadence through training.CheckpointManager
    (orbax), which ggml-opt does not have.
"""

from __future__ import annotations

import sys
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ZeroVoxConfig
from .train import TrainBatch, TrainState, loss_fn, _batch_shardings


def make_eval_fn(cfg: ZeroVoxConfig, mesh=None, use_stft: bool = True,
                 stft_resolutions=None) -> Callable[[Any, TrainBatch], Dict]:
    """Jitted loss-only forward — the eval half of ggml_opt_epoch
    (ggml-opt.cpp:710-717, ggml_opt_forward without backward)."""
    def eval_losses(params, batch: TrainBatch) -> Dict[str, jnp.ndarray]:
        return loss_fn(params, cfg, batch, use_stft=use_stft,
                       stft_resolutions=stft_resolutions)[1]

    if mesh is None:
        return jax.jit(eval_losses)
    return jax.jit(eval_losses, in_shardings=(None, _batch_shardings(mesh)))


def _take(data: TrainBatch, idx: np.ndarray) -> TrainBatch:
    # `data` leaves are device arrays (fit converts once, up front); only
    # the batch-sized gather result moves per step
    return jax.tree.map(lambda a: a[jnp.asarray(idx)], data)


def _loss_stats(device_losses: List[jnp.ndarray]) -> Tuple[float, float]:
    """(mean, uncertainty) of the per-batch losses — ggml_opt_result_loss's
    mean +- sem reporting (ggml-opt.cpp:326-352), fetched in one transfer."""
    vals = np.asarray(jax.device_get(jnp.stack(device_losses)), np.float64)
    sem = (vals.std(ddof=1) / np.sqrt(len(vals))) if len(vals) > 1 else 0.0
    return float(vals.mean()), float(sem)


def fit(state: TrainState,
        step_fn: Callable[[TrainState, TrainBatch], Tuple[TrainState, Dict]],
        data: TrainBatch,
        batch_size: int,
        epochs: int = 1,
        val_split: float = 0.0,
        eval_fn: Optional[Callable[[Any, TrainBatch], Dict]] = None,
        shuffle: bool = True,
        seed: int = 0,
        checkpoint_manager=None,
        checkpoint_every: int = 0,
        callback: Optional[Callable] = None,
        silent: bool = True,
        ) -> Tuple[TrainState, List[Dict[str, float]]]:
    """Train `state` over `data` for `epochs`; returns (state, history).

    data: a TrainBatch whose arrays carry a leading ndata axis (the
      in-memory dataset, ggml_opt_dataset's layout).
    step_fn: from make_sharded_train_step (or any (state, batch) ->
      (state, losses)).
    val_split: trailing fraction of the (once-shuffled) data reserved for
      the loss-only eval pass each epoch, as in ggml_opt_fit.
    eval_fn: from make_eval_fn; required when val_split > 0.
    callback(train, epoch, ibatch, nbatches, loss): per-batch progress hook
      (the progress-bar callback slot, ggml-opt.cpp:720-780); `loss` is a
      DEVICE scalar — fetch it only if you need it.
    checkpoint_every: save through checkpoint_manager every N optimizer
      steps (0 = never).
    history: per-epoch {"epoch", "train_loss", "train_loss_unc",
      "val_loss", "val_loss_unc", "seconds"}.
    """
    if not 0.0 <= val_split < 1.0:
        raise ValueError(f"val_split must be in [0, 1), got {val_split}")
    ndata = int(jax.tree.leaves(data)[0].shape[0])
    if batch_size > ndata:
        raise ValueError(f"batch_size {batch_size} > dataset size {ndata}")
    nbatches = ndata // batch_size
    dropped = ndata - nbatches * batch_size
    if dropped and not silent:
        print(f"fit: dropping {dropped} trailing datums "
              f"(ndata {ndata} % batch_size {batch_size})", file=sys.stderr)
    ibatch_split = int((1.0 - val_split) * nbatches)
    if ibatch_split == 0:
        raise ValueError("val_split leaves no training batches")
    if ibatch_split < nbatches and eval_fn is None:
        raise ValueError("val_split > 0 requires eval_fn (make_eval_fn)")
    idata_split = ibatch_split * batch_size

    # one host->device transfer of the dataset, up front — per-batch
    # jnp.asarray of numpy leaves would re-upload the WHOLE dataset every
    # step (O(epochs*nbatches*|dataset|) tunnel traffic)
    data = jax.tree.map(jnp.asarray, data)

    rng = np.random.default_rng(seed)
    order = np.arange(ndata)
    if shuffle and batch_size < ndata:
        rng.shuffle(order)                 # whole-set shuffle, once
    history: List[Dict[str, float]] = []

    for epoch in range(1, epochs + 1):
        if shuffle and batch_size < idata_split:
            order[:idata_split] = rng.permutation(order[:idata_split])
        t0 = time.time()
        train_losses: List[jnp.ndarray] = []
        for ib in range(ibatch_split):
            batch = _take(data, order[ib * batch_size:(ib + 1) * batch_size])
            state, losses = step_fn(state, batch)
            train_losses.append(losses["total"])
            if callback is not None:
                callback(True, epoch, ib + 1, ibatch_split, losses["total"])
            if (checkpoint_manager is not None and checkpoint_every
                    and (ib + 1 + (epoch - 1) * ibatch_split)
                    % checkpoint_every == 0):
                checkpoint_manager.save(state)
        val_losses: List[jnp.ndarray] = []
        for ib in range(ibatch_split, nbatches):
            batch = _take(data, order[ib * batch_size:(ib + 1) * batch_size])
            losses = eval_fn(state.params, batch)
            val_losses.append(losses["total"])
            if callback is not None:
                callback(False, epoch, ib + 1 - ibatch_split,
                         nbatches - ibatch_split, losses["total"])

        train_mean, train_unc = _loss_stats(train_losses)
        entry = {"epoch": epoch, "train_loss": train_mean,
                 "train_loss_unc": train_unc, "seconds": time.time() - t0}
        if val_losses:
            entry["val_loss"], entry["val_loss_unc"] = _loss_stats(val_losses)
        history.append(entry)
        if not silent:
            line = (f"fit: epoch {epoch:04d}/{epochs:04d} "
                    f"train={train_mean:.6f}+-{train_unc:.6f}")
            if val_losses:
                line += (f" val={entry['val_loss']:.6f}"
                         f"+-{entry['val_loss_unc']:.6f}")
            print(line + f" ({entry['seconds']:.1f}s)", file=sys.stderr,
                  flush=True)
    return state, history
