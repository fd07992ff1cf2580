"""Profiling subsystem tests."""

import json

from myimagecaptioningmodel_tpu.utils.profiling import StepTimer, annotate


def test_step_timer_summary(tmp_path):
    t = StepTimer("unit")
    for _ in range(5):
        with t:
            pass
    s = t.summary()
    assert s["count"] == 5
    assert s["mean_ms"] >= 0
    assert s["p50_ms"] <= s["max_ms"]
    p = tmp_path / "times.jsonl"
    t.dump(str(p))
    rec = json.loads(p.read_text().strip())
    assert rec["name"] == "unit"


def test_empty_timer():
    assert StepTimer("x").summary() == {"name": "x", "count": 0}


def test_annotate_context():
    with annotate("phase"):
        pass
