"""Persistent XLA compilation cache: warm-start the serving daemon.

The reference binary rebuilds its ggml graphs on every process start, which
is cheap (milliseconds — the graphs are hand-built metadata,
/root/reference/src/zerovox.cpp:104-138).  The TPU equivalent is NOT cheap:
XLA compiles real programs, and the first compile through the axon tunnel
can take minutes (CLAUDE.md).  The engine's warmup() pre-compiles every
ladder/bucket program so no REQUEST ever pays a compile — but a daemon
restart still re-pays all of them.

jax's persistent compilation cache closes that gap: compiled executables
are serialized to a directory keyed by (HLO, compile options, platform),
so a restarted daemon's warmup() loads programs instead of compiling them.
Measured on this repo's TINY pipeline (CPU): 11.1 s cold -> 1.4 s
warm-start in a fresh process; on the tunnel the saving is minutes.

Exposed as --compile-cache DIR on the synthesis CLI (one-shot + --serve)
and the training CLI.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str,
                         min_compile_time_secs: float = 1.0) -> str:
    """Persist compiled XLA programs under `path` (created if missing).

    Must be called before the programs are compiled (it applies to
    compiles issued after the call).  `min_compile_time_secs` skips
    trivial programs so the directory holds the expensive ones — pass 0.0
    to cache everything.  Returns the absolute cache path.
    """
    import jax

    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # default (>0) would skip small-but-slow-to-compile programs; the
    # time threshold above is the meaningful filter
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # By default jax places XLA's GPU per-fusion autotune cache under the
    # cache dir and embeds that ABSOLUTE PATH in the hashed compile
    # options — so every cache key depends on the cache directory's own
    # location: a moved/renamed cache silently invalidates itself, and
    # two processes pointing at different dirs can never share entries
    # (found by byte-diffing the serialized CompileOptions of two
    # processes whose only difference was the cache path).  The feature
    # is GPU-only — dead weight on TPU/CPU — so drop it; keys become
    # location-independent and the cache directory is relocatable.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    return path
