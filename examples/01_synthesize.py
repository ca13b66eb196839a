"""Library quickstart: one jitted synthesis call -> WAV file.

The whole pipeline (FastSpeech2 encoder -> variance adaptor -> length
regulator -> StyleTTS decoder -> HiFi-GAN vocoder) is ONE jit-compiled
XLA program with static shapes — no host round-trips between stages
(models/pipeline.py).  Run `--cpu` for a seconds-long TINY demo, or on a
TPU host with `--model checkpoint.gguf` for the production model.
"""

import os
import time

from _common import setup, demo_utterance


def main(argv=None):
    args, cfg, params = setup(argv)
    import numpy as np
    from zerovox_tpu import jit_synthesize
    from zerovox_tpu.io.wav import write_wav

    src, pun, style = demo_utterance(cfg)
    fn = jit_synthesize(params, cfg)

    t0 = time.perf_counter()
    res = fn(params, src, pun, style)
    res.wav.block_until_ready()
    print(f"compile + first run: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    res = fn(params, src, pun, style)
    wav = np.asarray(res.wav)[0]
    print(f"warm run (incl. host fetch): "
          f"{(time.perf_counter() - t0) * 1e3:.1f} ms")

    mel_len = int(np.asarray(res.mel_len)[0])
    n = mel_len * cfg.hop_size if mel_len else len(wav)
    out = os.path.join(args.out_dir, "example01.wav")
    write_wav(out, wav[:n] if n else wav, cfg.sampling_rate)
    print(f"wrote {out}: {n} samples "
          f"({n / cfg.sampling_rate:.2f}s @ {cfg.sampling_rate} Hz; "
          f"predicted mel_len={mel_len} frames)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
