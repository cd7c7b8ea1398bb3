"""Jit-compiled train and eval steps.

TPU redesign of the reference's eager per-batch loop
(``trainer/relgat_projector.py:419-676``): one donated, jitted step fuses
full-graph forward, device-resident negative sampling, both loss paths, the
optimizer update, and the non-finite-loss skip. Both reference loss paths are
covered:

- projection path (``trainer:587-655``): one ``single_gat_step``, separate
  pos/neg scoring, ``scorer.transform`` on positives, multi-objective loss,
- non-projection path (``trainer:559-585,657-676``): ranking loss on scores.

Negatives keep one canonical ``[B, K]`` layout end-to-end (fixing the
reference's K-major/B-major mismatch, SURVEY.md §3 quirk 1). Non-finite
losses skip the update without advancing the step counter
(``trainer:457,771-777`` semantics) via a ``where``-select of the whole
state instead of host control flow.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from relgat_projector_tpu import losses as L
from relgat_projector_tpu import metrics as M
from relgat_projector_tpu.config import ModelConfig, TrainConfig
from relgat_projector_tpu.data.graph import GraphData
from relgat_projector_tpu.models import scorer as sc
from relgat_projector_tpu.models.model import single_gat_step
from relgat_projector_tpu.ops.sampling import sample_negative_dst
from relgat_projector_tpu.train.state import TrainState


def score_batch(
    params: Any,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    x: jax.Array,        # [N_pad, D_sc] projected node representations
    num_real_nodes: int,
    src: jax.Array,     # [B]
    rel: jax.Array,     # [B]
    dst: jax.Array,     # [B]
    weight: jax.Array,  # [B] 0/1 validity mask
    *,
    neg_rng: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Scoring + loss for one triplet batch given precomputed node
    representations ``x`` (the post-GAT/projection matrix).

    Split out of :func:`batch_forward` so evaluation can compute ``x`` ONCE
    per :meth:`Trainer.evaluate` call — params are frozen during eval, so
    the full-graph GAT stack is identical across eval batches (the reference
    recomputes it per batch, ``trainer/relgat_projector.py:275-376``).
    """
    num_neg = train_cfg.num_neg

    src_vec = jnp.take(x, src, axis=0, mode="clip")   # [B, D]
    dst_vec = jnp.take(x, dst, axis=0, mode="clip")   # [B, D]
    pos_score = sc.score_triplets(
        params["scorer"], model_cfg.scorer_type, src_vec, rel, dst_vec
    )  # [B]

    # Device-resident corruption of destinations over REAL nodes only
    # (replaces the reference's CPU rejection loop, ``edge.py:100-113``).
    neg_dst = sample_negative_dst(
        neg_rng, dst, num_nodes=num_real_nodes, num_neg=num_neg
    )  # [B, K]
    neg_dst_vec = jnp.take(x, neg_dst, axis=0, mode="clip")  # [B, K, D]
    neg_score = sc.score_triplets(
        params["scorer"],
        model_cfg.scorer_type,
        src_vec[:, None, :],
        rel[:, None],
        neg_dst_vec,
    )  # [B, K]

    # Score sanitization (reference ``trainer:578-585,647-648``).
    nonfinite = jnp.sum(
        (~jnp.isfinite(pos_score)).astype(jnp.int32)
    ) + jnp.sum((~jnp.isfinite(neg_score)).astype(jnp.int32))
    pos_score = L.sanitize_scores(pos_score)
    neg_score = L.sanitize_scores(neg_score)

    metrics: Dict[str, jax.Array] = {"nonfinite_scores": nonfinite}

    if model_cfg.project_to_input_size:
        transformed = sc.transform(
            params["scorer"], model_cfg.scorer_type, src_vec, rel
        )  # [B, D]
        parts = L.multi_objective_loss(
            pos_score=pos_score,
            neg_score=neg_score,
            transformed_src=transformed,
            dst_vec=dst_vec,
            neg_dst_vec=neg_dst_vec,
            relgat_weight=train_cfg.relgat_weight,
            pos_cosine_weight=train_cfg.pos_cosine_weight,
            neg_cosine_weight=train_cfg.neg_cosine_weight,
            mse_weight=train_cfg.mse_weight,
            use_self_adv_neg=train_cfg.use_self_adv_neg,
            margin=train_cfg.margin,
            self_adv_alpha=train_cfg.self_adv_alpha,
            weights=weight,
        )
        loss = parts.total
        metrics.update(
            cosine_pos=jax.lax.stop_gradient(parts.cosine_pos),
            cosine_neg=jax.lax.stop_gradient(parts.cosine_neg),
            mse=jax.lax.stop_gradient(parts.mse),
        )
    else:
        loss = L.ranking_loss(
            pos_score,
            neg_score,
            use_self_adv_neg=train_cfg.use_self_adv_neg,
            margin=train_cfg.margin,
            self_adv_alpha=train_cfg.self_adv_alpha,
            weights=weight,
        )

    metrics.update(
        pos_score=jax.lax.stop_gradient(pos_score),
        neg_score=jax.lax.stop_gradient(neg_score),
        pos_score_mean=jnp.sum(pos_score * weight)
        / jnp.maximum(jnp.sum(weight), 1.0),
        neg_score_mean=jnp.sum(neg_score * weight[:, None])
        / jnp.maximum(jnp.sum(weight) * num_neg, 1.0),
    )
    return loss, metrics


def batch_forward(
    params: Any,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    node_emb: jax.Array,
    graph: GraphData,
    src: jax.Array,     # [B]
    rel: jax.Array,     # [B]
    dst: jax.Array,     # [B]
    weight: jax.Array,  # [B] 0/1 validity mask
    *,
    rng: jax.Array,
    train: bool,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full-graph forward + scoring + loss for one triplet batch.

    Returns ``(loss, metrics)`` where metrics includes the sanitized pos/neg
    scores for ranking metrics.
    """
    drop_rng, neg_rng = jax.random.split(rng)
    x = single_gat_step(
        params, model_cfg, node_emb, graph, train=train, rng=drop_rng
    )  # [N_pad, D_sc]
    return score_batch(
        params, model_cfg, train_cfg, x, graph.num_real_nodes,
        src, rel, dst, weight, neg_rng=neg_rng,
    )


def _global_norm(tree: Any) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(tree))
    )


def _step_body(
    state: TrainState,
    batch,
    node_emb: jax.Array,
    graph: GraphData,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    lr_schedule: Callable,
    ks,
):
    """One optimization step (shared by the single-step and scanned
    variants): fwd+loss, grads, update, non-finite skip-select, metrics."""
    src, rel, dst, weight = batch
    step_rng = jax.random.fold_in(state.rng, state.step)

    def loss_fn(params):
        return batch_forward(
            params, model_cfg, train_cfg, node_emb, graph,
            src, rel, dst, weight, rng=step_rng, train=True,
        )

    (loss, fwd_metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)

    # Skip-step on non-finite loss without advancing the schedule
    # (reference ``trainer:457,771-777``). All-padding batches (zero valid
    # examples — the scanned path's tail groups) are full no-ops too.
    active = jnp.sum(weight) > 0
    finite = jnp.logical_and(jnp.isfinite(loss), active)
    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    new_params = optax.apply_updates(state.params, updates)

    def select(new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(finite, a, b), new, old
        )

    next_state = TrainState(
        params=select(new_params, state.params),
        opt_state=select(new_opt_state, state.opt_state),
        step=state.step + finite.astype(jnp.int32),
        rng=state.rng,
        nonfinite_steps=state.nonfinite_steps
        + jnp.logical_and(~jnp.isfinite(loss), active).astype(jnp.int32),
    )

    mrr, hits = M.compute_mrr_hits(
        fwd_metrics["pos_score"], fwd_metrics["neg_score"], ks,
        weights=weight,
    )
    metrics = {
        "loss": loss,
        "finite": finite,
        "grad_norm": _global_norm(grads),
        "lr": lr_schedule(state.step),
        "mrr": mrr,
        **{f"hits@{k}": v for k, v in hits.items()},
        **{
            k: v
            for k, v in fwd_metrics.items()
            if k not in ("pos_score", "neg_score")
        },
    }
    return next_state, metrics


def make_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    lr_schedule: Callable,
) -> Callable:
    """Build the jitted train step ``(state, node_emb, graph, batch) ->
    (state, metrics)`` with donated state."""

    ks = tuple(train_cfg.eval_ks_ranks)

    @partial(jax.jit, static_argnames=(), donate_argnums=(0,))
    def train_step(
        state: TrainState,
        node_emb: jax.Array,
        graph: GraphData,
        src: jax.Array,
        rel: jax.Array,
        dst: jax.Array,
        weight: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        return _step_body(
            state, (src, rel, dst, weight), node_emb, graph,
            model_cfg, train_cfg, optimizer, lr_schedule, ks,
        )

    return train_step


def make_scan_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    lr_schedule: Callable,
    unroll_steps: int,
) -> Callable:
    """Multi-step variant: runs ``unroll_steps`` train steps inside ONE
    jitted ``lax.scan`` call over stacked batches ``[S, B]``.

    Amortizes per-dispatch host/runtime overhead (tens of ms through this
    image's remote PJRT relay) — the dominant cost for small graphs. Returns
    ``(state, metrics)`` where metric leaves are stacked ``[S]``.
    """
    ks = tuple(train_cfg.eval_ks_ranks)

    @partial(jax.jit, donate_argnums=(0,))
    def scan_step(state, node_emb, graph, src_s, rel_s, dst_s, weight_s):
        def scan_body(carry, xs):
            return _step_body(
                carry, xs, node_emb, graph,
                model_cfg, train_cfg, optimizer, lr_schedule, ks,
            )

        return jax.lax.scan(
            scan_body, state, (src_s, rel_s, dst_s, weight_s),
            length=unroll_steps,
        )

    return scan_step


def make_eval_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
) -> Tuple[Callable, Callable]:
    """Build ``(repr_fn, eval_step)`` for evaluation.

    ``repr_fn(params, node_emb, graph) -> x`` runs the full-graph GAT stack
    + projection ONCE; ``eval_step(params, x, graph, batch..., rng)`` scores
    one triplet batch against the precomputed ``x`` and returns weighted-sum
    metric contributions so the host can example-weight across ragged
    batches (reference ``trainer:275-376`` semantics). Params are frozen
    during eval, so hoisting ``x`` out of the per-batch loop is a pure
    optimization over the reference's per-batch full-graph recompute."""

    ks = tuple(train_cfg.eval_ks_ranks)

    @jax.jit
    def eval_repr(
        params: Any, node_emb: jax.Array, graph: GraphData
    ) -> jax.Array:
        return single_gat_step(
            params, model_cfg, node_emb, graph, train=False, rng=None
        )

    @jax.jit
    def eval_step(
        params: Any,
        x: jax.Array,
        graph: GraphData,
        src: jax.Array,
        rel: jax.Array,
        dst: jax.Array,
        weight: jax.Array,
        rng: jax.Array,
    ) -> Dict[str, jax.Array]:
        # Same rng split as the train-path batch_forward: the second key
        # drives negative sampling (the first would be dropout, off here).
        _, neg_rng = jax.random.split(rng)
        loss, fwd = score_batch(
            params, model_cfg, train_cfg, x, graph.num_real_nodes,
            src, rel, dst, weight, neg_rng=neg_rng,
        )
        mrr, hits = M.compute_mrr_hits(
            fwd["pos_score"], fwd["neg_score"], ks, weights=weight
        )
        n = jnp.sum(weight)
        out = {
            "n_examples": n,
            "loss_sum": loss * n,
            "mrr_sum": mrr * n,
            "pos_score_mean": fwd["pos_score_mean"],
            "neg_score_mean": fwd["neg_score_mean"],
            # Example-weighted contributions so the host can aggregate the
            # full reference eval namespace (``trainer:323-376``, SURVEY
            # §5.5): eval/pos_score_mean, eval/neg_score_mean.
            "pos_score_mean_sum": fwd["pos_score_mean"] * n,
            "neg_score_mean_sum": fwd["neg_score_mean"] * n,
            "nonfinite_scores": fwd["nonfinite_scores"],
            **{f"hits@{k}_sum": v * n for k, v in hits.items()},
        }
        for key in ("cosine_pos", "cosine_neg", "mse"):
            if key in fwd:
                out[f"{key}_sum"] = fwd[key] * n
        return out

    return eval_repr, eval_step
