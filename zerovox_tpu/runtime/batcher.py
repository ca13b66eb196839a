"""Dynamic request batching: coalesce concurrent one-shot requests.

The reference processes exactly one utterance per process
(/root/reference/src/zerovox.cpp:396-406); a serving daemon sees many
concurrent independent requests.  Device batch scaling is linear (B=8
runs 8 utterances in ~28 ms where B=1 takes ~3.5 ms each —
docs/ARCHITECTURE §8), so what coalescing buys is NOT more device
throughput but amortization of per-dispatch overhead (program launch,
host work, and any host<->device round-trip latency) over the batch.
Through the ~30 ms-RTT / ~40 MB/s axon tunnel the measured A/B says
leave it OFF (transfers are the wall — ARCHITECTURE §13); on a
co-located deployment the amortization term is what remains and the
window earns its keep.

`DynamicBatcher` is continuous batching with a fill window: a request
enqueues and blocks; a dispatcher thread pops compatible requests (up to
the engine's ladder top) and makes ONE `synthesize_async` dispatch —
ladder-padded, so the compile-key set stays exactly the warmup()-covered
set.  A lone request on an idle daemon dispatches IMMEDIATELY (zero
added latency); coalescing comes from requests that arrive while a
dispatch is in flight, plus up to `window_ms` of extra fill time that
only applies when the engine was already busy.

Dispatch and fetch are PIPELINED: the dispatcher hands each batch's
fetch() closure to a small completion pool and immediately forms the
next batch, so batch k+1's device compute overlaps batch k's host fetch
(measured 845 -> 583 ms for 4 B=8 rounds on the chip,
scripts/measure_packed_phases.py).  `max_inflight` dispatches may be in
flight at once — the semaphore doubles as backpressure: when the device
is saturated the dispatcher blocks, the queue fills, and the next batch
forms larger (continuous batching's natural feedback loop).

Off by default (the measured single-request latency story stays intact);
enable with `TTSServer(batch_window_ms=...)` / CLI `--batch-window-ms`.
Requests are grouped by their (trim, pcm16) flags — only compatible
requests share a dispatch.
"""

from __future__ import annotations

import threading
import time
from typing import List, Optional, Tuple

import numpy as np


class _Pending:
    __slots__ = ("src", "pun", "style", "n", "key",
                 "done", "wav", "mel_len", "error")

    def __init__(self, src, pun, style, n, key):
        self.src, self.pun, self.style, self.n = src, pun, style, n
        self.key = key
        self.done = threading.Event()
        self.wav: Optional[np.ndarray] = None
        self.mel_len: Optional[int] = None
        self.error: Optional[BaseException] = None


class DynamicBatcher:
    """Blocking facade over TTSEngine.synthesize_async with coalescing."""

    def __init__(self, engine, window_ms: float = 5.0,
                 max_batch: Optional[int] = None,
                 request_timeout_s: float = 120.0,
                 max_inflight: int = 3):
        self.engine = engine
        self.window_s = float(window_ms) / 1e3
        self.max_batch = int(max_batch or engine.batch_ladder[-1])
        self.request_timeout_s = float(request_timeout_s)
        self._cond = threading.Condition()
        self._queue: List[_Pending] = []
        self._stop = False
        # pipelining: bound the number of dispatched-but-unfetched batches
        # (device queue depth / HBM for their outputs), and complete them
        # on a pool so fetches overlap the next dispatch
        from concurrent.futures import ThreadPoolExecutor
        self._inflight = threading.Semaphore(max(1, int(max_inflight)))
        self._pool = ThreadPoolExecutor(max_workers=max(1, int(max_inflight)),
                                        thread_name_prefix="zv-fetch")
        # observability (GET /metrics): dispatch count, packed request
        # count, and the largest batch actually formed
        self._stats_lock = threading.Lock()
        self.stats = {"dispatches": 0, "requests": 0, "max_batch": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="zv-batcher")
        self._thread.start()

    # ------------------------------------------------------------- request
    def synthesize(self, src, pun, style, n, trim: bool = True,
                   pcm16: bool = False) -> Tuple[np.ndarray, int]:
        """Enqueue ONE utterance (B=1 arrays) and block for its result."""
        item = _Pending(np.asarray(src), np.asarray(pun),
                        np.asarray(style), np.asarray(n),
                        key=(bool(trim), bool(pcm16)))
        if item.src.shape[0] != 1:
            raise ValueError("DynamicBatcher.synthesize takes one utterance "
                             "(B=1 arrays); use engine.synthesize_packed "
                             "for caller-assembled batches")
        with self._cond:
            if self._stop:
                raise RuntimeError("batcher is shut down")
            self._queue.append(item)
            self._cond.notify_all()
        if not item.done.wait(timeout=self.request_timeout_s):
            # dequeue the abandoned request if the dispatcher has not
            # taken it yet — otherwise a stalled engine unwedges into
            # packed dispatches nobody is waiting on, serialized ahead
            # of the clients' retries
            with self._cond:
                if item in self._queue:
                    self._queue.remove(item)
            raise TimeoutError(f"batched synthesis did not complete in "
                               f"{self.request_timeout_s}s")
        if item.error is not None:
            raise item.error
        return item.wav, item.mel_len

    # ---------------------------------------------------------- dispatcher
    def _take_batch(self) -> List[_Pending]:
        """Block until work exists and pop one compatible batch.  Runs in
        the dispatcher thread.

        Policy: if the dispatcher had to SLEEP (the engine is idle), take
        what's there immediately — a lone request on an idle daemon pays
        zero added latency, and coalescing emerges from arrivals during
        its in-flight run (continuous batching).  If requests accumulated
        while the engine was busy, window up to `window_s` more to fill
        the batch toward the ladder top before dispatching."""
        with self._cond:
            was_idle = False
            while not self._queue and not self._stop:
                was_idle = True
                self._cond.wait()
            if self._stop and not self._queue:
                return []
            key = self._queue[0].key
            if not was_idle:
                deadline = time.monotonic() + self.window_s
                while not self._stop:
                    n_match = sum(1 for q in self._queue if q.key == key)
                    left = deadline - time.monotonic()
                    if n_match >= self.max_batch or left <= 0:
                        break
                    self._cond.wait(timeout=left)
            batch = [q for q in self._queue if q.key == key][: self.max_batch]
            for q in batch:
                self._queue.remove(q)
            return batch

    def _loop(self):
        while True:
            batch = self._take_batch()
            if not batch:
                # An empty batch is NOT always shutdown: the windowing
                # cond.wait releases the lock, so a request that hits its
                # client-side timeout can dequeue itself mid-window and
                # leave nothing matching the captured key.  Only exit when
                # stop was requested and the queue is drained; otherwise go
                # back to waiting.
                with self._cond:
                    drained = self._stop and not self._queue
                if not drained:
                    continue
                # stopped and drained; wait for in-flight completions
                self._pool.shutdown(wait=True)
                return
            self._inflight.acquire()
            trim, pcm16 = batch[0].key
            try:
                fetch = self.engine.synthesize_async(
                    np.concatenate([q.src for q in batch]),
                    np.concatenate([q.pun for q in batch]),
                    np.concatenate([q.style for q in batch]),
                    np.concatenate([q.n for q in batch]),
                    trim=trim, pcm16=pcm16)
            except BaseException as e:     # dispatch failed: deliver now
                self._inflight.release()
                self._finish(batch, error=e)
                continue
            self._pool.submit(self._complete, batch, fetch)

    def _complete(self, batch: List[_Pending], fetch):
        """Completion-pool worker: block on the fetch, deliver results."""
        try:
            wavs, mel_len = fetch()
            for i, q in enumerate(batch):
                q.wav, q.mel_len = wavs[i], int(mel_len[i])
            error = None
        except BaseException as e:         # deliver failures to the waiters
            error = e
        finally:
            self._inflight.release()
        self._finish(batch, error=error)

    def _finish(self, batch: List[_Pending], error=None):
        if error is not None:
            for q in batch:
                q.error = error
        with self._stats_lock:
            self.stats["dispatches"] += 1
            self.stats["requests"] += len(batch)
            self.stats["max_batch"] = max(self.stats["max_batch"],
                                          len(batch))
        for q in batch:
            q.done.set()

    def snapshot(self) -> dict:
        with self._stats_lock:
            return dict(self.stats)

    def stop(self):
        """Stop accepting requests; the dispatcher drains what's queued."""
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._thread.join(timeout=self.request_timeout_s)
