"""BlockStats / trace helpers."""

import time

from tpu_sdr.utils.profiling import BlockStats, trace


def test_block_stats_accumulates():
    stats = BlockStats()
    for _ in range(4):
        with stats.block(1000):
            time.sleep(0.002)
    stats.drop(3)
    assert stats.blocks == 4 and stats.samples == 4000
    assert stats.dropped_blocks == 3
    assert stats.avg_block_ms >= 2.0
    assert stats.busy_samples_per_sec > 0
    assert "4 blocks" in stats.summary() and "3 dropped" in stats.summary()


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must not require jax or start a profiler
