"""Learning-rate schedules matching reference tools/util.py:20-119.

The reference builds these as in-graph Paddle ops over an auto-incrementing
step counter with ``layers.Switch`` control flow; here each schedule is a
pure, jit-traceable ``step -> lr`` function (usable directly as an optax
schedule), evaluated from the optimizer step count. Counter-origin quirks are
preserved: the warmup variants count steps from 1 (util.py:55,99), the plain
restart variant from 0 (util.py:47-51,76).

Strategies (reference get_lr, util.py:20-44):
- None                         constant base_lr
- 'cosine_decay'               Paddle fluid.layers.cosine_decay
- 'cosine_decay_restart'       TF cosine_decay_restarts port (t_mul=2, m_mul=1)
- 'cosine_decay_warmup'        linear warmup then single cosine
- 'cosine_decay_restart_warmup' linear warmup then cosine restarts
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def constant(base_lr: float) -> Schedule:
    return lambda step: jnp.full((), base_lr, jnp.float32)


def cosine_decay(base_lr: float, step_each_epoch: int, epochs: int) -> Schedule:
    """Paddle fluid.layers.cosine_decay: lr * 0.5 * (cos(epoch*pi/epochs) + 1)."""

    def schedule(step):
        cur_epoch = jnp.floor(step / step_each_epoch)
        return base_lr * 0.5 * (jnp.cos(cur_epoch * math.pi / epochs) + 1.0)

    return schedule


def cosine_decay_warmup(
    base_lr: float,
    step_each_epoch: int,
    max_epochs: int,
    warmup_epoch: int,
    start_lr: float = 0.00001,
) -> Schedule:
    """Linear warmup over ``warmup_epoch`` epochs, then cosine to 0
    (reference util.py:54-66; its step counter begins at 1)."""
    linear_factor = (base_lr - start_lr) / warmup_epoch

    def schedule(step):
        gstep = step.astype(jnp.float32) + 1.0  # counter begins at 1
        cur_epoch = jnp.floor(gstep / step_each_epoch)
        warm = start_lr + linear_factor * cur_epoch
        decayed = (
            0.5
            * base_lr
            * (jnp.cos((cur_epoch - warmup_epoch) * math.pi / float(max_epochs - warmup_epoch)) + 1.0)
        )
        return jnp.where(cur_epoch < warmup_epoch, warm, decayed)

    return schedule


def _restart_fraction(completed_fraction, t_mul: float):
    """(i_restart, within-restart fraction) per TF cosine_decay_restarts.

    ``completed_fraction`` is clamped at 0 so the never-taken warmup branch
    of jnp.where does not produce NaNs (log of a negative).
    """
    cf = jnp.maximum(completed_fraction, 0.0)
    if t_mul == 1.0:
        i_restart = jnp.floor(cf)
        cf = cf - i_restart
    else:
        i_restart = jnp.floor(
            jnp.log(1.0 - cf * (1.0 - t_mul)) / math.log(t_mul)
        )
        sum_r = (1.0 - t_mul**i_restart) / (1.0 - t_mul)
        cf = (cf - sum_r) / t_mul**i_restart
    return i_restart, cf


def cosine_decay_restart(
    base_lr: float,
    step_each_epoch: int,
    decay_epochs: int,
    m_mul: float = 1.0,
    t_mul: float = 2.0,
) -> Schedule:
    """TF cosine_decay_restarts on the epoch index (reference util.py:69-89)."""

    def schedule(step):
        cur_epoch = jnp.floor(step.astype(jnp.float32) / step_each_epoch)
        i_restart, cf = _restart_fraction(cur_epoch / decay_epochs, t_mul)
        m_fac = m_mul**i_restart
        return base_lr * 0.5 * m_fac * (jnp.cos(math.pi * cf) + 1.0)

    return schedule


def cosine_decay_restart_warmup(
    base_lr: float,
    step_each_epoch: int,
    decay_epochs: int,
    warmup_epoch: int,
    t_mul: float = 2.0,
    start_lr: float = 0.00001,
) -> Schedule:
    """Warmup then cosine restarts (reference util.py:92-119).

    The reference increments a persistent epoch variable whenever
    ``global_step % step_each_epoch == 0`` with the counter starting at 1,
    which makes cur_epoch == floor(global_step / step_each_epoch).
    """
    linear_step = base_lr - start_lr

    def schedule(step):
        gstep = step.astype(jnp.float32) + 1.0
        cur_epoch = jnp.floor(gstep / step_each_epoch)
        warm = start_lr + linear_step * (cur_epoch / float(warmup_epoch))
        _i, cf = _restart_fraction((cur_epoch - warmup_epoch) / decay_epochs, t_mul)
        decayed = base_lr * 0.5 * (jnp.cos(math.pi * cf) + 1.0)
        return jnp.where(cur_epoch < warmup_epoch, warm, decayed)

    return schedule


def get_lr(
    strategy: Optional[str],
    base_lr: float,
    sample_cnt: int,
    batch_size: int,
    decay_epoch: int = 0,
    warmup_epoch: int = 3,
    max_epoch: int = 10,
) -> Schedule:
    """Strategy dispatch matching reference util.get_lr (util.py:20-44)."""
    valid = (
        None,
        "cosine_decay",
        "cosine_decay_restart",
        "cosine_decay_restart_warmup",
        "cosine_decay_warmup",
    )
    if strategy not in valid:
        raise ValueError(f"unknown lr decay strategy {strategy!r}")
    step_each_epoch = math.ceil(sample_cnt / batch_size)
    if strategy is None:
        return constant(base_lr)
    if strategy == "cosine_decay":
        return cosine_decay(base_lr, step_each_epoch, decay_epoch)
    if strategy == "cosine_decay_restart":
        return cosine_decay_restart(base_lr, step_each_epoch, decay_epoch)
    if strategy == "cosine_decay_warmup":
        return cosine_decay_warmup(
            base_lr, step_each_epoch, max_epoch, warmup_epoch
        )
    return cosine_decay_restart_warmup(
        base_lr, step_each_epoch, decay_epoch, warmup_epoch
    )


def from_config(cfg) -> Schedule:
    t = cfg.train
    return get_lr(
        t.lr_decay_strategy,
        t.learning_rate,
        cfg.data.sample_count,
        t.batch_size,
        decay_epoch=t.decay_epoch,
        warmup_epoch=t.warmup_epoch,
        max_epoch=t.max_epoch,
    )
