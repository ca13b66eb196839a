"""Verify a checkpoint against the reference C++ implementation.

`cli --verify` (or `zerovox_tpu.utils.verify.verify_checkpoint`) compiles
the reference's own FS2Encoder / StyleTTSDecoder / HiFiGAN classes
(unmodified, against the vendored ggml build), loads the SAME GGUF into
both implementations, and diffs all three eval() boundaries — the
shippable form of the repo's numerics-parity gate, usable on any
user-supplied checkpoint (e.g. after training + export).

Needs the reference source tree (default /root/reference; override with
ZEROVOX_REF) and a C/C++ toolchain; when either is missing the report
says so instead of failing.
"""

import os

from _common import setup


def main(argv=None):
    args, cfg, params = setup(argv)
    from zerovox_tpu.params import save_params
    from zerovox_tpu.utils.verify import verify_checkpoint

    # any GGUF works — here, the demo weights written by our own writer
    # (conv kernels stored f16 exactly like the reference exporter)
    path = os.path.join(args.out_dir, "example06.gguf")
    save_params(path, params, cfg)
    print(f"wrote {path}")

    report = verify_checkpoint(path, log=lambda m: print(m))
    print(report.summary())
    if report.skipped_reason:
        print("(reference harness unavailable — install a toolchain and "
              "point ZEROVOX_REF at the reference checkout to run the diff)")


if __name__ == "__main__":
    main()
