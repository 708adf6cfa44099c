"""Shared three-stage async pipeline for tunneled-TPU serving paths.

On a TPU reached over a network tunnel, three blocking host operations can
overlap per request: the host->device upload (~30-35 ms control RTT plus
bytes), the program-dispatch control round-trip (~10 ms), and the
device->host download (bytes-bound, ~90 ms for a 10 s float32 clip at the
measured ~21 MB/s tunnel bandwidth). Round 4 measured the cost of fusing
them: an upload-free sustained loop ran ~25% faster than true serving of
the same program (PERF.md round-4, scripts/bench_serving_pipeline.py).
One thread per blocking stage closes that gap.

``ServingPipeline`` (serving.py) and ``StreamingSR`` (streaming.py) both
ride this core — round 5 unified their previously separate thread stacks
(two hand-rolled implementations of the same measured-optimal structure).

New capability vs the reference, whose serving surface is one blocking
clip at a time (reference: example.py:1-13, app.py:8-19).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, List, Optional, Sequence

_CLOSE = object()  # shutdown sentinel, forwarded stage to stage


class StagePipeline:
    """Chain of worker threads connected by FIFO queues.

    ``stages`` are callables ``value -> value | None``, each running on
    its own daemon thread, consuming from its input queue and forwarding
    non-None results to the next stage. Returning ``None`` DROPS the item
    — the convention for "this stage already routed the failure itself"
    (e.g. ``Future.set_exception``). One thread per stage + FIFO queues
    preserve submission order end to end, so order-sensitive consumers
    (the streaming stitcher) need no reordering buffer.

    ``depths[i]`` bounds the queue feeding stage ``i+1`` — backpressure:
    the dispatch->fetch queue capacity is what limits
    dispatched-but-unfetched device buffers (HBM). The queue feeding
    stage 0 is unbounded so ``put`` never blocks the caller.

    A stage that RAISES (a bug — stages are expected to route their own
    per-item errors) does not kill its thread or deadlock ``close``: the
    exception is recorded in ``stage_errors`` and the item is dropped.
    Callers check ``stage_errors`` after ``close()``.
    """

    def __init__(self, stages: Sequence[Callable],
                 depths: Sequence[Optional[int]]):
        if len(depths) != len(stages) - 1:
            raise ValueError(
                f"need {len(stages) - 1} inter-stage depths, got {len(depths)}")
        self._qs = [queue.Queue()] + [
            queue.Queue(maxsize=d) if d else queue.Queue() for d in depths]
        self.stage_errors: List[BaseException] = []
        self._threads = []
        for i, fn in enumerate(stages):
            th = threading.Thread(target=self._worker, args=(i, fn),
                                  daemon=True)
            th.start()
            self._threads.append(th)

    def _worker(self, i: int, fn: Callable):
        q_in = self._qs[i]
        q_out = self._qs[i + 1] if i + 1 < len(self._qs) else None
        while True:
            item = q_in.get()
            if item is _CLOSE:
                if q_out is not None:
                    q_out.put(_CLOSE)
                return
            try:
                out = fn(item)
            except Exception as e:  # backstop: record, keep draining
                self.stage_errors.append(e)
                continue
            if out is not None and q_out is not None:
                q_out.put(out)

    def put(self, item) -> None:
        """Enqueue one work item; never blocks (stage-0 queue unbounded)."""
        self._qs[0].put(item)

    def close(self) -> None:
        """Flush every queued item through all stages, then join the
        threads. Idempotent-safe only once; callers guard re-entry."""
        self._qs[0].put(_CLOSE)
        for th in self._threads:
            th.join()
