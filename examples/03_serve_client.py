"""The HTTP daemon + programmatic client, in one process.

Production runs the daemon standalone (`python -m zerovox_tpu.cli
--model m.gguf --serve`, see docs/SERVING.md); here we start TTSServer
on a thread and drive every endpoint through TTSClient: health, one-shot
synthesis, a bucket-packed /batch, and a chunked /stream consumed at
time-to-first-audio.
"""

import os
import time

from _common import setup, demo_utterance


def main(argv=None):
    args, cfg, params = setup(argv)
    import numpy as np
    from zerovox_tpu.runtime.server import TTSServer
    from zerovox_tpu.runtime.client import TTSClient, utterance
    from zerovox_tpu.io.wav import write_wav

    chunk = 16 if args.cpu else 64
    server = TTSServer(params, cfg, port=0, warmup=True,
                       chunk_frames=chunk, overlap=chunk // 4)
    server.start()
    host, port = server.address
    c = TTSClient(host, port)
    print(f"daemon up at {host}:{port}: {c.health()}")

    src, pun, style = demo_utterance(cfg)
    ph, st, pu = src[0].tolist(), style[0].tolist(), pun[0].tolist()

    # one-shot (?trim=0 keeps the full padded buffer so the demo's
    # random-weight mel_len=0 still yields audible output)
    wav, sr = c.synthesize(ph, st, pu, trim=False)
    out = os.path.join(args.out_dir, "example03.wav")
    write_wav(out, wav, sr)
    print(f"/synthesize -> {len(wav)} samples -> {out}")

    # same request over the raw-binary body (application/octet-stream):
    # the latency fast path — identical audio, no JSON decode server-side
    wav_b, _ = c.synthesize(ph, st, pu, trim=False, binary=True)
    assert (wav_b == wav).all()
    print(f"/synthesize (binary body) -> identical {len(wav_b)} samples")

    # batch: one packed device dispatch for N utterances
    utts = []
    for s in (1, 2):
        s2, p2, st2 = demo_utterance(cfg, seed=s)
        utts.append(utterance(s2[0].tolist(), st2[0].tolist(),
                              p2[0].tolist()))
    wavs, mel_len, _ = c.batch(utts, trim=False)
    print(f"/batch     -> {len(wavs)} wavs, mel_len={mel_len}")

    # stream: chunks arrive as the daemon flushes them
    t0 = time.perf_counter()
    total, first = 0, None
    for chunk_pcm in c.stream(ph, st, pu):
        if first is None:
            first = (time.perf_counter() - t0) * 1e3
        total += len(chunk_pcm)
    print(f"/stream    -> first chunk {first:.1f} ms, {total} samples")

    print("metrics:", c.metrics()["endpoints"])
    server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
