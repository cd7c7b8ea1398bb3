"""Learning-rate schedules (linear / cosine / constant with linear warmup).

Parity with reference ``core/lr.py:10-104``:
- ``total_steps = ceil(len(train) / batch_size) * epochs`` (``lr.py:96-100``),
- default warmup = 10% of total when unset, clamped to ``total - 1``
  (``lr.py:102-104``),
- three LambdaLR shapes with linear warmup (``lr.py:47-67``),
- optional extra multiplicative decay ``lr_decay ** max(0, step - warmup)``
  (``lr.py:78-90``).

The schedule maps the 0-indexed optimizer step (the reference steps the
scheduler after each optimizer step, so step ``t`` uses ``lambda(t)``) to an
absolute learning rate; plugged into optax via ``scale_by_learning_rate``.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp

from relgat_projector_tpu.config import Defaults


def compute_total_and_warmup_steps(
    num_train_examples: int,
    batch_size: int,
    epochs: int,
    warmup_steps: Optional[int],
    warmup_ratio: float = Defaults.DEFAULT_WARMUP_RATIO,
):
    steps_per_epoch = max(1, math.ceil(num_train_examples / batch_size))
    total_steps = steps_per_epoch * max(1, int(epochs))
    if warmup_steps is None:
        warmup_steps = int(warmup_ratio * total_steps)
    warmup_steps = min(int(warmup_steps), max(0, total_steps - 1))
    return total_steps, warmup_steps


def make_lr_schedule(
    base_lr: float,
    scheduler_type: str,
    total_steps: int,
    warmup_steps: int,
    lr_decay: float = 1.0,
) -> Callable:
    """Return ``schedule(step) -> lr`` (jit-traceable on ``step``)."""
    scheduler_type = scheduler_type.lower()
    if scheduler_type not in ("linear", "cosine", "constant"):
        raise ValueError(f"Unknown lr_scheduler type: {scheduler_type}")

    ws = float(warmup_steps)
    ts = float(total_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, ws)

        if scheduler_type == "linear":
            after = jnp.maximum(0.0, (ts - step) / jnp.maximum(1.0, ts - ws))
        elif scheduler_type == "cosine":
            progress = (step - ws) / jnp.maximum(1.0, ts - ws)
            progress = jnp.clip(progress, 0.0, 1.0)
            after = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        else:  # constant
            after = jnp.asarray(1.0, jnp.float32)

        mult = jnp.where(step < ws, warm, after)
        if lr_decay != 1.0:
            mult = mult * jnp.power(
                jnp.asarray(lr_decay, jnp.float32),
                jnp.maximum(0.0, step - ws),
            )
        return base_lr * mult

    return schedule
