"""Train state + optimizer construction.

The reference trains with ``torch.optim.Adam(lr, weight_decay)`` — i.e. L2
regularization folded into the gradient BEFORE the Adam moments
(``trainer/relgat_projector.py:265-269``) — with optional global-norm grad
clipping before the step (``trainer:462-466``). The optax chain reproduces
that ordering exactly; ``optimizer="adamw"`` gives the decoupled variant the
reference left as a TODO (``trainer:264``).

The state carries everything needed for true preemption resume (params, Adam
moments, step counter, base RNG key) — the reference saved weights only and
could not resume (SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from relgat_projector_tpu.config import TrainConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array       # int32 count of SUCCESSFUL (finite-loss) steps
    rng: jax.Array        # base PRNG key; per-step keys are fold_in(rng, step)
    nonfinite_steps: jax.Array  # int32 count of skipped non-finite steps


def make_optimizer(
    cfg: TrainConfig, lr_schedule: Callable
) -> optax.GradientTransformation:
    parts = []
    if cfg.grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(float(cfg.grad_clip_norm)))
    opt = cfg.optimizer.lower()
    if opt == "adam":
        # torch-Adam semantics: L2 before the moments.
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(float(cfg.weight_decay)))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif opt == "adamw":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(float(cfg.weight_decay)))
    else:
        raise ValueError(f"Unknown optimizer: {cfg.optimizer}")
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


def create_train_state(
    params: Any,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    step: int = 0,
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.asarray(step, jnp.int32),
        rng=rng,
        nonfinite_steps=jnp.asarray(0, jnp.int32),
    )
