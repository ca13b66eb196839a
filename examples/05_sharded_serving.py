"""Multi-chip serving: data-parallel AND tensor-parallel meshes.

Pure DP (mesh d,1): the engine shard_maps its front and vocoder programs
over the mesh's data axis — each chip runs the complete local pipeline
(fused Pallas kernels included) on its slice of the batch with ZERO
collectives; the right topology for a model that fits on one chip
(docs/SERVING.md).  TP (mesh d,m): TPServingEngine channel-shards the
front and time-shards the vocoder so ONE utterance spreads across chips
— for checkpoints that outgrow a chip's HBM.  With --cpu this runs on a
virtual 8-device CPU mesh (the same code path the driver's multichip
dryrun validates); on a real pod slice these are the production
`--serve --mesh 8,1` / `--serve --mesh 2,4` configurations.
"""

import time

from _common import setup, demo_utterance


def main(argv=None):
    args, cfg, params = setup(argv, need_devices=8)
    import jax
    import numpy as np
    from zerovox_tpu.parallel import make_mesh
    from zerovox_tpu.runtime.engine import TTSEngine

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, model=1)
    print(f"devices: {n_dev} -> mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    engine = TTSEngine(params, cfg, mesh=mesh)
    B = engine.batch_ladder[-1]          # ladder top scales with the mesh
    engine.warmup(batch=B)
    src, pun, style = demo_utterance(cfg, batch=B)
    n = np.full((B,), cfg.max_n_phonemes, np.int32)

    t0 = time.perf_counter()
    wavs, mel_len = engine.synthesize(src, pun, style, n, trim=False)
    wall = (time.perf_counter() - t0) * 1e3
    print(f"B={B} packed dispatch over {n_dev} chips: {wall:.1f} ms "
          f"({wall / B:.2f} ms/utterance); wav[0] {np.asarray(wavs[0]).shape}")

    # row 0 must equal a single-device run of the same utterance —
    # sharding changes placement, never numerics
    solo = TTSEngine(params, cfg)
    w0, _ = solo.synthesize(src[:1], pun[:1], style[:1], n[:1], trim=False)
    np.testing.assert_allclose(np.asarray(wavs[0]), np.asarray(w0[0]),
                               atol=5e-5)
    print("DP row 0 matches the single-device engine bit-for-bit(ish)")

    # tensor parallelism: one utterance spread across the model axis
    from zerovox_tpu.runtime.tp_engine import TPServingEngine
    tp_mesh = make_mesh(data=max(1, n_dev // 4), model=min(4, n_dev))
    tp = TPServingEngine(params, cfg, tp_mesh)
    tp.warmup(batch=1)
    t0 = time.perf_counter()
    tp_wavs, _ = tp.synthesize(src[:1], pun[:1], style[:1], n[:1],
                               trim=False)
    wall = (time.perf_counter() - t0) * 1e3
    print(f"TP {dict(zip(tp_mesh.axis_names, tp_mesh.devices.shape))} "
          f"B=1 dispatch: {wall:.1f} ms")
    np.testing.assert_allclose(np.asarray(tp_wavs[0]), np.asarray(w0[0]),
                               atol=2e-4, rtol=1e-3)   # psum float reorder
    print("TP wav matches the single-device engine within collective "
          "float tolerance")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
