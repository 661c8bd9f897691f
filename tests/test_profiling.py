"""Step-timer / profiling utility tests."""

import os
import time

from tpudf.utils.profiling import StepTimer, device_memory_stats


def test_step_timer_stats(tmp_path):
    csv_path = str(tmp_path / "steps.csv")
    t = StepTimer(csv_path=csv_path)
    for _ in range(5):
        with t.step(n_items=4):
            time.sleep(0.002)
    s = t.stats()
    assert s["steps"] == 5
    assert s["mean_s"] >= 0.002
    assert s["items_per_sec"] > 0
    assert os.path.exists(csv_path)
    assert len(open(csv_path).readlines()) == 6     # header + 5 rows


def test_device_memory_stats():
    out = device_memory_stats()
    assert len(out) >= 1
    assert "device" in out[0]
