"""Training: fit() on synthetic data, export to GGUF, reload, synthesize.

The training stack (training/) mirrors ggml-opt's epoch driver on top of
a sharded jitted train step: masked mel/duration losses (+ optional
multi-resolution STFT through the vocoder), AdamW with LR schedules,
gradient accumulation, orbax checkpoint/resume.  The exported GGUF is
the same wire format the reference consumes.  The standalone CLI wraps
exactly this flow: `python -m zerovox_tpu.training.cli --synthetic 16
--tiny --epochs 2 --export m.gguf`.
"""

import os

from _common import setup, demo_utterance


def main(argv=None):
    args, cfg, params = setup(argv)
    from zerovox_tpu.parallel import make_mesh
    from zerovox_tpu.training.cli import synthetic_dataset
    from zerovox_tpu.training.fit import fit
    from zerovox_tpu.training.train import make_sharded_train_step

    # DP over every device present (a single chip, a virtual CPU mesh,
    # or a pod slice — same code; the step is sharding-annotated and XLA
    # inserts the collectives)
    import jax
    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, model=1)
    batch = max(4, n_dev)                 # batch must divide the data axis
    data = synthetic_dataset(cfg, n=4 * batch, seed=0)
    state, step = make_sharded_train_step(
        cfg, mesh, params, use_stft=False)   # no-STFT: fast demo loss

    state, history = fit(state, step, data, batch_size=batch, epochs=2,
                         val_split=0.25, shuffle=True, silent=True,
                         eval_fn=_eval(cfg, mesh))
    for h in history:
        print(f"epoch {h['epoch']}: train {h['train_loss']:.4f} "
              f"val {h['val_loss']:.4f} ({h['seconds']:.1f}s)")
    assert history[-1]["train_loss"] < history[0]["train_loss"] * 1.5

    out = os.path.join(args.out_dir, "example04.gguf")
    from zerovox_tpu.training.checkpoint import export_weights_gguf
    export_weights_gguf(out, state, cfg)
    print(f"exported {out} ({os.path.getsize(out)} bytes)")

    # reload through the standard loader and synthesize with the result
    import numpy as np
    from zerovox_tpu import load_params, jit_synthesize
    cfg2, params2 = load_params(out)
    src, pun, style = demo_utterance(cfg2)
    res = jit_synthesize(params2, cfg2)(params2, src, pun, style)
    wav = np.asarray(res.wav)
    assert np.isfinite(wav).all()
    print(f"reloaded checkpoint synthesizes: wav {wav.shape}, finite")
    return 0


def _eval(cfg, mesh):
    from zerovox_tpu.training.fit import make_eval_fn
    return make_eval_fn(cfg, mesh=mesh, use_stft=False)


if __name__ == "__main__":
    raise SystemExit(main())
