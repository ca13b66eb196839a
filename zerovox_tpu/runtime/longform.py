"""Long-form synthesis: split over-long utterances, batch, concatenate.

The reference hard-caps every utterance at MAX_N_PHONEMES=120 and
silently truncates anything longer (/root/reference/src/zerovox.h:37,
src/zerovox.cpp:200 forces num_phonemes to MAX).  This module turns the
cap into seamless long-text support: an over-long phoneme sequence is
split into <= max_n_phonemes windows — preferring punctuation marks
(nonzero punct ids) as boundaries, which coincide with prosodic breaks —
and the windows ride ONE bucket-packed engine dispatch
(engine.synthesize_packed; under a mesh they also shard across chips).
The per-window waveforms concatenate in order.

The split is a documented tradeoff, not a bit-parity path: each window
is synthesized without cross-window attention context, so prosody can
differ near a boundary from a hypothetical larger-capacity model.  The
reference offers no alternative at all (it truncates).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def split_points(puncts: Sequence[int], n: int, cap: int) -> List[int]:
    """End indices (exclusive) of each window of an n-phoneme utterance.

    Greedy: each window ends at the LAST punctuation mark (punct id != 0)
    within the next `cap` phonemes — a prosodic break — or at the hard
    cap when no punctuation exists in range.  Every window is 1..cap
    long and the windows partition [0, n).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1 (got {cap})")
    pu = np.asarray(puncts)
    ends: List[int] = []
    start = 0
    while start < n:
        if n - start <= cap:
            ends.append(n)
            break
        window = pu[start:start + cap]
        marks = np.flatnonzero(window != 0)
        # split AFTER the punctuation phoneme; fall back to the hard cap
        end = start + (int(marks[-1]) + 1 if marks.size else cap)
        ends.append(end)
        start = end
    return ends


def split_utterance(phonemes: Sequence[int], puncts: Sequence[int],
                    cap: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split one over-long utterance into a padded (k, cap) batch.

    Returns (src, pun, num_phonemes): k windows, each zero-padded to
    `cap` exactly like a normal single utterance.
    """
    ph = np.asarray(phonemes, dtype=np.int32)
    pu = np.asarray(puncts, dtype=np.int32)
    if ph.ndim != 1 or pu.shape != ph.shape:
        raise ValueError("phonemes/puncts must be equal-length 1-D")
    n = len(ph)
    ends = split_points(pu, n, cap)
    k = len(ends)
    src = np.zeros((k, cap), np.int32)
    pun = np.zeros((k, cap), np.int32)
    lens = np.zeros((k,), np.int32)
    start = 0
    for i, end in enumerate(ends):
        m = end - start
        src[i, :m] = ph[start:end]
        pun[i, :m] = pu[start:end]
        lens[i] = m
        start = end
    return src, pun, lens


def synthesize_long(engine, phonemes, puncts, style_embed,
                    pcm16: bool = False,
                    max_windows: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Synthesize an utterance of ANY length through `engine`.

    Splits at punctuation boundaries (split_utterance), runs all windows
    as one bucket-packed batch with the single style embedding broadcast
    to every window, and concatenates the trimmed waveforms in order.
    Returns (waveform, per-window mel_len).

    max_windows > 0 rejects utterances that split into more windows
    (ValueError): each window is a full utterance of device work, so a
    server exposing this path must bound it like a /batch request — an
    unbounded split would let one request mint minutes of serialized
    dispatches (the device-work analogue of the body-size cap).
    """
    cap = engine.cfg.max_n_phonemes
    src, pun, lens = split_utterance(phonemes, puncts, cap)
    if max_windows and src.shape[0] > max_windows:
        raise ValueError(
            f"utterance splits into {src.shape[0]} windows, exceeding the "
            f"cap of {max_windows}; send it in several requests")
    style = np.asarray(style_embed, np.float32).reshape(1, -1)
    style = np.repeat(style, src.shape[0], axis=0)
    wavs, mel_len = engine.synthesize_packed(src, pun, style, lens,
                                             trim=True, pcm16=pcm16)
    return np.concatenate(wavs, axis=0), np.asarray(mel_len)
