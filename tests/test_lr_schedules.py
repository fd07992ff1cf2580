"""Closed-form checks of the LR schedules (reference tools/util.py math)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from myimagecaptioningmodel_tpu.training import lr_schedules as lrs


def val(schedule, step):
    return float(schedule(jnp.asarray(step, jnp.int32)))


def test_constant():
    s = lrs.constant(5e-5)
    assert val(s, 0) == pytest.approx(5e-5)
    assert val(s, 10_000) == pytest.approx(5e-5)


def test_cosine_decay_closed_form():
    base, sse, epochs = 1e-3, 100, 10
    s = lrs.cosine_decay(base, sse, epochs)
    for step in (0, 99, 100, 550, 999):
        cur_epoch = step // sse
        expect = base * 0.5 * (math.cos(cur_epoch * math.pi / epochs) + 1)
        assert val(s, step) == pytest.approx(expect, rel=1e-6)
    assert val(s, 0) == pytest.approx(base)


def test_cosine_decay_warmup():
    base, sse, max_e, warm, start = 1e-3, 10, 10, 3, 1e-5
    s = lrs.cosine_decay_warmup(base, sse, max_e, warm, start)
    lin = (base - start) / warm
    # counter begins at 1: step 0 -> gstep 1 -> epoch 0
    assert val(s, 0) == pytest.approx(start)
    # step 19 -> gstep 20 -> epoch 2 (warmup)
    assert val(s, 19) == pytest.approx(start + lin * 2)
    # step 49 -> gstep 50 -> epoch 5 (cosine)
    expect = 0.5 * base * (math.cos((5 - warm) * math.pi / (max_e - warm)) + 1)
    assert val(s, 49) == pytest.approx(expect, rel=1e-6)


def test_cosine_decay_restart_periods():
    base, sse, d = 1e-3, 10, 2  # first period 2 epochs, second 4 (t_mul=2)
    s = lrs.cosine_decay_restart(base, sse, d)
    assert val(s, 0) == pytest.approx(base)  # epoch 0: fresh
    # epoch 1: halfway through first period -> cf=0.5
    assert val(s, 10) == pytest.approx(base * 0.5 * (math.cos(math.pi * 0.5) + 1), rel=1e-5)
    # epoch 2: restart boundary -> back to base
    assert val(s, 20) == pytest.approx(base, rel=1e-5)
    # epoch 4: halfway through the 4-epoch second period
    assert val(s, 40) == pytest.approx(base * 0.5 * (math.cos(math.pi * 0.5) + 1), rel=1e-5)


def test_cosine_decay_restart_warmup_branches():
    base, sse, d, warm, start = 1e-3, 10, 4, 2, 1e-5
    s = lrs.cosine_decay_restart_warmup(base, sse, d, warm, start_lr=start)
    # epoch 0 (steps 0..8): warmup fraction 0
    assert val(s, 0) == pytest.approx(start)
    # epoch 1: halfway through warmup
    assert val(s, 10) == pytest.approx(start + (base - start) * 0.5, rel=1e-6)
    # epoch 2: cosine begins at full base
    assert val(s, 20) == pytest.approx(base, rel=1e-5)
    # epoch 4: cf = (4-2)/4 = 0.5
    assert val(s, 40) == pytest.approx(base * 0.5 * (math.cos(math.pi * 0.5) + 1), rel=1e-5)
    # warmup branch produced no NaN from the restart log
    assert np.isfinite(val(s, 5))


def test_get_lr_dispatch_and_validation():
    with pytest.raises(ValueError):
        lrs.get_lr("bogus", 1e-3, 100, 10)
    s = lrs.get_lr(None, 1e-3, 100, 10)
    assert val(s, 5) == pytest.approx(1e-3)
    s = lrs.get_lr("cosine_decay", 1e-3, 1000, 10, decay_epoch=5)
    assert val(s, 0) == pytest.approx(1e-3)
