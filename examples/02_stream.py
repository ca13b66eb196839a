"""Chunked streaming synthesis: first audio long before the utterance
finishes.

StreamingSynthesizer (models/streaming.py) runs the encoder+decoder
front once, then vocodes overlapping mel windows chunk by chunk; chunks
are bit-exact prefixes of the one-shot waveform, so a player can start
at time-to-first-audio (~tens of ms) instead of waiting for the full
utterance.
"""

import os
import time

from _common import setup, demo_utterance


def main(argv=None):
    args, cfg, params = setup(argv)
    import numpy as np
    from zerovox_tpu.models.streaming import StreamingSynthesizer
    from zerovox_tpu.io.wav import StreamingWavWriter

    chunk = 16 if args.cpu else 64
    s = StreamingSynthesizer(params, cfg, chunk_frames=chunk,
                             overlap=chunk // 4)
    s.warmup()                      # compile outside the timed loop

    src, pun, style = demo_utterance(cfg)
    out = os.path.join(args.out_dir, "example02.wav")
    t0 = time.perf_counter()
    with StreamingWavWriter(out, cfg.sampling_rate) as w:
        for i, piece in enumerate(s.stream(src, pun, style)):
            if i == 0:
                print(f"first chunk after "
                      f"{(time.perf_counter() - t0) * 1e3:.1f} ms")
            w.write(np.asarray(piece))
        n = w.samples_written
    print(f"wrote {out}: {n} samples in {i + 1} chunks "
          f"({n / cfg.sampling_rate:.2f}s audio, "
          f"total wall {(time.perf_counter() - t0) * 1e3:.1f} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
