"""StagePipeline unit tests: ordering, drop convention, backstop, flush.

The thread trio under ServingPipeline and StreamingSR (pipeline.py) —
its contracts (FIFO order end to end, None-drops, stage exceptions never
deadlock close) are what the serving tests rely on implicitly.
"""

import threading
import time

import pytest

from flowhigh_tpu.pipeline import StagePipeline


class TestStagePipeline:
    def test_fifo_order_preserved(self):
        out = []
        pipe = StagePipeline([lambda x: x * 2, lambda x: x + 1,
                              out.append], depths=[2, 2])
        for i in range(50):
            pipe.put(i)
        pipe.close()
        assert out == [2 * i + 1 for i in range(50)]
        assert pipe.stage_errors == []

    def test_none_drops_item(self):
        out = []
        pipe = StagePipeline([lambda x: None if x % 2 else x, out.append],
                             depths=[2])
        for i in range(10):
            pipe.put(i)
        pipe.close()
        assert out == [0, 2, 4, 6, 8]

    def test_stage_exception_recorded_not_deadlocked(self):
        out = []

        def boom(x):
            if x == 3:
                raise RuntimeError("stage bug")
            return x

        pipe = StagePipeline([boom, out.append], depths=[1])
        for i in range(6):
            pipe.put(i)
        pipe.close()  # must return despite the raise
        assert out == [0, 1, 2, 4, 5]
        assert len(pipe.stage_errors) == 1
        assert "stage bug" in str(pipe.stage_errors[0])

    def test_backpressure_bounds_inflight(self):
        """With depth 1 between stage 0 and 1 and a slow stage 1, stage 0
        can run at most (1 queued + 1 in-hand) ahead."""
        inflight_max = []
        lock = threading.Lock()
        state = {"produced": 0, "consumed": 0}

        def produce(x):
            with lock:
                state["produced"] += 1
                inflight_max.append(state["produced"] - state["consumed"])
            return x

        def consume(x):
            time.sleep(0.01)
            with lock:
                state["consumed"] += 1

        pipe = StagePipeline([produce, consume], depths=[1])
        for i in range(20):
            pipe.put(i)
        pipe.close()
        assert state["consumed"] == 20
        assert max(inflight_max) <= 3  # 1 queued + 1 in stage hand + self

    def test_depth_count_validated(self):
        with pytest.raises(ValueError, match="depths"):
            StagePipeline([lambda x: x], depths=[1])

    def test_put_never_blocks(self):
        release = threading.Event()

        def slow(x):
            release.wait(5)

        pipe = StagePipeline([slow], depths=[])
        t0 = time.perf_counter()
        for i in range(100):
            pipe.put(i)
        assert time.perf_counter() - t0 < 1.0
        release.set()
        pipe.close()
