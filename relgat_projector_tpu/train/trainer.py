"""RelGATTrainer — the training runtime.

TPU redesign of reference ``trainer/relgat_projector.py:31-910``. The wiring
order and observable behavior match (seed -> schedule -> dataset -> storage
-> logger -> model -> optimizer; epoch loop with periodic step logging,
step/epoch eval, early stopping, best-checkpoint saves, final save), but the
hot path is one donated jitted step with device-resident negative sampling,
and metric fetches are deferred to log boundaries so the device never stalls
per batch.

Quirk fixes vs the reference (documented deltas, SURVEY.md §3):
1. best-metric direction: lower-is-better for ``cosine_pos``, HIGHER-is-
   better when falling back to MRR (the reference hardcoded lower-is-better
   for both, so decreasing MRR counted as improvement),
2. ``early_stop_patience=None`` disables early stopping instead of crashing,
3. checkpoint pruning works,
4. training can RESUME from a checkpoint (full train state).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from relgat_projector_tpu.config import RunConfig
from relgat_projector_tpu.data.dataset import Batch, RelGATData
from relgat_projector_tpu.schedules import (
    compute_total_and_warmup_steps,
    make_lr_schedule,
)
from relgat_projector_tpu.train.checkpoint import RelGATStorage
from relgat_projector_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
)
from relgat_projector_tpu.train.step import make_eval_step, make_train_step
from relgat_projector_tpu.utils.logging_adapter import LoggerAdapter
from relgat_projector_tpu.utils.seeding import RandomSeed
import dataclasses


class RelGATTrainer:
    def __init__(
        self,
        run_config: RunConfig,
        node2emb: Dict[int, np.ndarray],
        rel2idx: Dict[str, int],
        edge_index_raw: List[Tuple[int, int, str]],
        *,
        log_to_wandb: bool = False,
        log_to_console: bool = True,
    ):
        tc = run_config.train

        # Multi-process (multi-host) awareness: when ``jax.distributed`` is
        # initialized across 2+ processes, each process must (a) construct
        # only ITS feature shards, (b) write checkpoints/logs only on the
        # primary, (c) barrier on resume. Single-process runs are entirely
        # unaffected (SURVEY §5.8).
        self._multiprocess = jax.process_count() > 1
        from relgat_projector_tpu.parallel.distributed import is_primary

        self._is_primary = (not self._multiprocess) or is_primary()

        # Seed first so the split is reproducible (reference ``trainer:97-99``).
        self.seeder = RandomSeed(tc.seed)

        # Graph-axis layout choice (ModelConfig.mesh_propagate):
        # - "halo": node-sharded features + boundary-only all_to_all
        #   (parallel/halo.py) — default, works for XLA and Pallas,
        # - "replicated": replicated features, per-device blocked shards
        #   (parallel/pallas_sharded.py) — Pallas only,
        # - "gspmd": sharded edge lists, XLA-inserted psums (XLA only).
        graph_axis = (
            run_config.mesh.graph_axis
            if run_config.mesh.num_devices > 1
            else 1
        )
        mp = run_config.model.mesh_propagate
        if (
            graph_axis > 1
            and mp == "replicated"
            and not run_config.model.use_pallas
        ):
            raise ValueError(
                "mesh_propagate='replicated' is the per-device Pallas-shard"
                " path and requires use_pallas=True; use 'halo' (default) "
                "or 'gspmd' for the XLA path"
            )
        # Halo layout whenever the propagate is partitioned at all: over
        # dst ranges (graph axis) and/or attention heads (model axis; a
        # 1-shard halo graph is exchange-free but carries the layout).
        use_halo = mp == "halo" and (
            graph_axis > 1
            or (
                run_config.mesh.num_devices > 1
                and run_config.mesh.model_axis > 1
            )
        )
        # Segment scanning (ModelConfig.scan_segments) bounds per-edge
        # gather memory to E/S per device. It composes with the halo mesh
        # (per-shard segment stacks scanned inside shard_map) but not with
        # the replicated-Pallas mesh path or the halo overlap split.
        scan_segments = (
            run_config.model.scan_segments
            if (
                run_config.model.use_pallas
                and run_config.model.scan_segments > 1
            )
            else 0
        )
        if scan_segments > 1 and graph_axis > 1 and mp == "replicated":
            raise ValueError(
                "scan_segments > 1 with a graph mesh axis requires "
                "mesh_propagate='halo' (the replicated-Pallas path has no "
                "scanned per-device layouts)"
            )
        halo_overlap = run_config.model.halo_overlap
        if scan_segments > 1 and use_halo and halo_overlap:
            # The scanned VJP yields final rows, not mergeable softmax
            # partials; at scanning scale per-shard compute dwarfs the
            # boundary all_to_all (docs/SCALING.md), so dropping the
            # overlap split costs ~nothing.
            print(
                "scan_segments > 1: disabling halo comm/compute overlap "
                "(scanned propagate has no partial-merge form)"
            )
            halo_overlap = False
        self.dataset = RelGATData(
            node2emb,
            rel2idx,
            edge_index_raw,
            train_ratio=tc.train_ratio,
            seed=tc.seed,
            blocked=run_config.model.use_pallas,
            graph_shards=(
                graph_axis
                if (
                    graph_axis > 1
                    and run_config.model.use_pallas
                    and mp == "replicated"
                )
                else 1
            ),
            halo_shards=graph_axis if use_halo else 0,
            halo_overlap=halo_overlap,
            partition_nodes=run_config.model.partition_nodes,
            scan_segments=scan_segments,
            # Blocked layout: auto-tuned from THIS graph's degree
            # distribution via the calibrated cost model
            # (data/layout_tuner.py — the sweep-measured optimum shifts
            # with degree stats, BENCH_NOTES r2/r3), unless the config
            # pins explicit TD/TE.
            chunk_edges=run_config.model.chunk_edges or None,
            block_nodes=run_config.model.block_nodes or None,
            kernel_precision=run_config.model.kernel_precision,
            # For VMEM feasibility filtering: the kernels stream [TE, H*F]
            # blocks, so production tiles (H*F >= ~2048) must shrink TE.
            heads_features=(
                run_config.model.gat_heads * run_config.model.gat_out_dim
            ),
            # Multi-process halo training: never stack the full [N, D]
            # feature matrix on any host — each process materializes only
            # its graph-shard row ranges via dataset.feature_rows below.
            materialize_features=not (self._multiprocess and use_halo),
        )
        self._use_halo = use_halo

        # Derive data-dependent model dims.
        self.model_cfg = dataclasses.replace(
            run_config.model,
            in_dim=self.dataset.emb_dim,
            num_rel=self.dataset.num_rel,
        )
        self.run_config = dataclasses.replace(run_config, model=self.model_cfg)
        self.train_cfg = tc

        self.total_steps, self.warmup_steps = compute_total_and_warmup_steps(
            self.dataset.num_train,
            tc.train_batch_size,
            tc.epochs,
            tc.warmup_steps,
        )
        self.lr_schedule = make_lr_schedule(
            tc.lr, tc.lr_scheduler, self.total_steps, self.warmup_steps,
            tc.lr_decay,
        )
        self.optimizer = make_optimizer(tc, self.lr_schedule)

        self.storage = RelGATStorage(
            out_dir=tc.out_dir,
            max_checkpoints=tc.max_checkpoints,
            save_every_n_steps=tc.save_every_n_steps,
        )
        self.log_adapter = LoggerAdapter(
            run_name=run_config.run_name,
            architecture_name=run_config.architecture_name,
            base_model_name=run_config.base_model_name,
            log_every_n_steps=tc.log_every_n_steps,
            # Non-primary processes stay silent (one W&B run, one console
            # stream per job).
            log_to_wandb=log_to_wandb and self._is_primary,
            log_to_console=log_to_console and self._is_primary,
            run_config=self.run_config.to_dict(),
        )

        # Model + state.
        from relgat_projector_tpu.models.model import init_model

        root_key = self.seeder.jax_key()
        init_key, train_key = jax.random.split(root_key)
        params = init_model(init_key, self.model_cfg)
        self.state: TrainState = create_train_state(
            params, self.optimizer, train_key
        )

        self.node_emb = (
            jnp.asarray(self.dataset.node_emb)
            if self.dataset.node_emb is not None
            else None  # deferred: built sharded under the mesh below
        )
        self.graph = self.dataset.graph

        # Multi-chip placement (GSPMD path): DP over the batch on the 'data'
        # axis, edge partitioning on the 'graph' axis, replicated state.
        # Single-device configs skip placement entirely.
        self.mesh = None
        mesh_cfg = run_config.mesh
        if mesh_cfg.num_devices > 1:
            from relgat_projector_tpu.parallel import (
                make_mesh,
                place_graph,
                place_node_features,
                place_replicated,
            )

            if self.model_cfg.use_pallas and mp == "gspmd":
                raise ValueError(
                    "mesh_propagate='gspmd' has no Pallas partitioning; "
                    "use 'halo' (default) or 'replicated' with use_pallas"
                )
            if mesh_cfg.model_axis > 1:
                if mp != "halo":
                    raise ValueError(
                        "model_axis > 1 (head TP) requires "
                        "mesh_propagate='halo'"
                    )
                if self.model_cfg.gat_heads % mesh_cfg.model_axis != 0:
                    raise ValueError(
                        f"gat_heads={self.model_cfg.gat_heads} not divisible"
                        f" by model_axis={mesh_cfg.model_axis}"
                    )
            self.mesh = make_mesh(mesh_cfg)
            self.state = place_replicated(self.mesh, self.state)
            # Halo mode keeps node features SHARDED over the graph axis
            # end-to-end (boundary-only exchange per layer); otherwise the
            # feature matrix is replicated.
            if self.node_emb is None:
                # Deferred multi-process path: assemble the global sharded
                # feature matrix straight from per-row-range loads — this
                # process materializes ONLY its addressable shards' rows
                # (never the full [N, D] matrix).
                from jax.sharding import PartitionSpec
                from relgat_projector_tpu.parallel.mesh import GRAPH_AXIS
                from relgat_projector_tpu.parallel.sharded import (
                    make_global_from_row_loader,
                )

                self.node_emb = make_global_from_row_loader(
                    self.mesh,
                    (self.graph.num_nodes, self.dataset.emb_dim),
                    np.float32,
                    PartitionSpec(GRAPH_AXIS),
                    self.dataset.feature_rows,
                )
            elif self._use_halo:
                self.node_emb = place_node_features(self.mesh, self.node_emb)
            else:
                self.node_emb = place_replicated(self.mesh, self.node_emb)
            self.graph = place_graph(self.mesh, self.graph)
        elif self.node_emb is None:
            # Deferred features require a mesh; fall back to materializing.
            self.node_emb = jnp.asarray(
                self.dataset.feature_rows(0, self.graph.num_nodes)
            )

        self.steps_per_call = max(1, int(tc.steps_per_call))
        self._train_step = make_train_step(
            self.model_cfg, tc, self.optimizer, self.lr_schedule
        )
        self._scan_step = None
        if self.steps_per_call > 1:
            from relgat_projector_tpu.train.step import make_scan_train_step

            self._scan_step = make_scan_train_step(
                self.model_cfg, tc, self.optimizer, self.lr_schedule,
                self.steps_per_call,
            )
        self._eval_repr, self._eval_step = make_eval_step(self.model_cfg, tc)

        # Loop bookkeeping (parity with reference fields). Two counters:
        # - dispatch_step: host-side count of DISPATCHED train steps —
        #   exact without device syncs, drives all log/eval/save cadence
        #   (deterministic even when steps skip on non-finite losses),
        # - global_step: the device's finite-step counter (reference
        #   semantics — skipped steps don't count, ``trainer:457,476``),
        #   reconciled from the device at sync points and used for
        #   reporting and checkpoint naming.
        self.dispatch_step = 0
        self.global_step = 0
        self.training_should_stop = False
        self.eval_every_n_steps = (
            int(tc.eval_every_n_steps)
            if tc.eval_every_n_steps is not None and int(tc.eval_every_n_steps) > 0
            else None
        )
        self.early_stop_patience = (
            int(tc.early_stop_patience)
            if tc.early_stop_patience is not None
            else None
        )
        self.eval_ks_ranks = tuple(sorted(set(tc.eval_ks_ranks)))
        # Fixed metric directions (SURVEY §3 quirk 2): cosine_pos lower is
        # better; MRR fallback higher is better.
        self.best_metric_value: Optional[float] = None
        self._no_improve_steps = 0
        self.best_ckpt_dir: Optional[str] = None

        self.log_adapter.init_wandb_if_needed()

    def _device_batch(self, batch: Batch):
        if self.mesh is not None:
            from relgat_projector_tpu.parallel import place_batch

            # place_batch is multi-process safe (host numpy in, global
            # sharded arrays out); no intermediate local device_put.
            return place_batch(
                self.mesh, batch.src, batch.rel, batch.dst, batch.weight
            )
        return (
            jnp.asarray(batch.src),
            jnp.asarray(batch.rel),
            jnp.asarray(batch.dst),
            jnp.asarray(batch.weight),
        )

    # ------------------------------------------------------------------
    # Resume
    # ------------------------------------------------------------------
    def maybe_resume(self, ckpt_dir: Optional[str] = None) -> bool:
        """Restore full train state from ``ckpt_dir`` (or the newest
        resumable checkpoint under ``out_dir``). Returns True if resumed.

        Multi-process: barriers first (so a primary still flushing its
        final async write can't race the readers), then verifies every
        process picked the SAME checkpoint step — divergent filesystem
        views would otherwise silently train from mixed states."""
        if self._multiprocess:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("relgat:resume")
        target = ckpt_dir or self.storage.latest_resumable()
        if self._multiprocess:
            # Same collective on every process regardless of outcome (a
            # conditional gather would deadlock on disagreement).
            self._assert_processes_agree(
                "resume_target_found", float(target is not None)
            )
        if target is None:
            return False
        self.state = self.storage.load_checkpoint(target, self.state)
        if self.mesh is not None:
            # Loaded leaves are host arrays; re-establish the replicated
            # global placement (multi-process safe) before the donated
            # jitted step consumes the state.
            from relgat_projector_tpu.parallel import place_replicated

            self.state = place_replicated(self.mesh, self.state)
        self.global_step = int(self.state.step)
        self.dispatch_step = self.global_step
        # Restore the LOOP state too (best metric, early-stop counter,
        # best-checkpoint pointer, exact dispatch counter) — without it a
        # resumed run forgets its early-stop history and re-saves a "best"
        # checkpoint on its first eval regardless of quality.
        loop = self.storage.load_loop_state(target)
        if loop is not None:
            if loop.get("best_metric_value") is not None:
                self.best_metric_value = float(loop["best_metric_value"])
            self._no_improve_steps = int(loop.get("no_improve_steps", 0))
            self.best_ckpt_dir = loop.get("best_ckpt_dir")
            if loop.get("dispatch_step") is not None:
                self.dispatch_step = int(loop["dispatch_step"])
        if self._multiprocess:
            self._assert_processes_agree(
                "resume_step", float(self.global_step) + 1.0
            )
        if self._is_primary:
            print(f"Resumed from {target} at step {self.global_step}")
        return True

    def _assert_processes_agree(self, what: str, value: float) -> None:
        """Fail hard if ``value`` differs across processes (e.g. two hosts
        resolved different resume checkpoints)."""
        from jax.experimental import multihost_utils

        got = np.asarray(
            multihost_utils.process_allgather(np.float64(value))
        ).reshape(-1)
        if not np.all(got == got[0]):
            raise RuntimeError(
                f"multi-process disagreement on {what}: "
                f"process values {got.tolist()}"
            )

    # ------------------------------------------------------------------
    # Evaluation (reference ``trainer:275-376``)
    # ------------------------------------------------------------------
    def evaluate(self, ks: Optional[Tuple[int, ...]] = None):
        ks = tuple(ks) if ks else self.eval_ks_ranks
        sums: Dict[str, float] = {}
        n_total = 0.0
        nonfinite_total = 0
        eval_rng = jax.random.fold_in(self.state.rng, 2**30)
        # Params are frozen for the whole evaluation, so the full-graph GAT
        # stack is computed ONCE and every batch scores against it (the
        # reference recomputes the stack per eval batch,
        # ``trainer/relgat_projector.py:286-300``).
        x_repr = self._eval_repr(self.state.params, self.node_emb, self.graph)
        for bi, batch in enumerate(
            self.dataset.eval_batches(self.train_cfg.eval_batch_size)
        ):
            out = self._eval_step(
                self.state.params,
                x_repr,
                self.graph,
                *self._device_batch(batch),
                jax.random.fold_in(eval_rng, bi),
            )
            out = jax.device_get(out)
            n_b = float(out["n_examples"])
            n_total += n_b
            for k, v in out.items():
                if k.endswith("_sum"):
                    sums[k] = sums.get(k, 0.0) + float(v)

            # Per-batch eval metric logging, reference ``trainer:323-351``
            # (same fixed global step; the device_get above already paid
            # the sync).
            batch_metrics = {
                "eval/pos_score_mean": float(out["pos_score_mean"]),
                "eval/neg_score_mean": float(out["neg_score_mean"]),
            }
            denom_b = max(1.0, n_b)
            if "cosine_pos_sum" in out:
                batch_metrics["eval/cosine_mean_batch_pos"] = (
                    float(out["cosine_pos_sum"]) / denom_b
                )
            if "cosine_neg_sum" in out:
                batch_metrics["eval/cosine_mean_batch_neg"] = (
                    float(out["cosine_neg_sum"]) / denom_b
                )
            if "mse_sum" in out:
                batch_metrics["eval/mse_mean_batch"] = (
                    float(out["mse_sum"]) / denom_b
                )
            nf = int(out["nonfinite_scores"])
            if nf:
                # Reference logs the counter only when nonzero
                # (``trainer:578-585``).
                batch_metrics["eval/nonfinite_scores"] = nf
                nonfinite_total += nf
            self.log_adapter.log_metrics(
                metrics=batch_metrics, step=self.global_step
            )

        n = max(1.0, n_total)
        avg_mrr = sums.get("mrr_sum", 0.0) / n
        avg_hits = {k: sums.get(f"hits@{k}_sum", 0.0) / n for k in ks}
        avg_loss = sums.get("loss_sum", 0.0) / n
        avg_cos_pos = (
            sums["cosine_pos_sum"] / n if "cosine_pos_sum" in sums else None
        )
        avg_cos_neg = (
            sums["cosine_neg_sum"] / n if "cosine_neg_sum" in sums else None
        )
        avg_mse = sums["mse_sum"] / n if "mse_sum" in sums else None
        # Aggregates beyond the reference's return tuple, consumed by
        # _run_eval_and_maybe_early_stop for the eval/* namespace.
        self._last_eval_extra = {
            "eval/pos_score_mean": sums.get("pos_score_mean_sum", 0.0) / n,
            "eval/neg_score_mean": sums.get("neg_score_mean_sum", 0.0) / n,
        }
        if nonfinite_total:
            self._last_eval_extra["eval/nonfinite_scores"] = nonfinite_total
        return avg_mrr, avg_hits, avg_loss, avg_cos_pos, avg_cos_neg, avg_mse

    # ------------------------------------------------------------------
    # Training loop (reference ``trainer:378-496``)
    # ------------------------------------------------------------------
    def train(self, epochs: Optional[int] = None):
        epochs = int(epochs) if epochs is not None else self.train_cfg.epochs
        self._log_begin_information()

        for epoch in range(1, epochs + 1):
            self._single_epoch(epoch, epochs)
            if self.training_should_stop:
                break
            if self.eval_every_n_steps is None:
                if self._run_eval_and_maybe_early_stop(epoch=epoch):
                    break

        out_model_dir = self._save_checkpoint(subdir=None)
        self.storage.wait_for_writes()
        if self._is_primary:
            print(f"\nTraining finished - model saved to: {out_model_dir}")
        self.log_adapter.finish_wandb_if_needed()
        return out_model_dir

    def _single_epoch(self, epoch: int, epochs: int):
        if self._scan_step is not None:
            return self._single_epoch_scanned(epoch, epochs)
        bs = self.train_cfg.train_batch_size
        # Deferred metric futures: device scalars fetched only at log time.
        pending: List[Tuple[int, Any]] = []
        running_loss = 0.0
        running_examples = 0

        for step_in_epoch, batch in enumerate(
            self.dataset.train_batches(bs), start=1
        ):
            step_start = time.time()
            self.state, metrics = self._train_step(
                self.state,
                self.node_emb,
                self.graph,
                *self._device_batch(batch),
            )
            self.dispatch_step += 1
            self.global_step += 1
            n_valid = float(batch.weight.sum())
            pending.append((step_in_epoch, metrics, n_valid, step_start))

            if self.dispatch_step % self.log_adapter.log_every_n_steps == 0:
                running_loss, running_examples = self._flush_logs(
                    epoch, pending, running_loss, running_examples
                )
                pending = []

            if (
                self.eval_every_n_steps is not None
                and self.dispatch_step % self.eval_every_n_steps == 0
            ):
                if self._run_eval_and_maybe_early_stop(epoch=epoch):
                    self.training_should_stop = True
                    return

        # Unflushed tail steps simply roll off unlogged (same as the
        # reference, which only logs at the cadence boundary).

    def _single_epoch_scanned(self, epoch: int, epochs: int):
        """Epoch loop dispatching ``steps_per_call`` steps per jitted call
        (lax.scan). Metrics arrive stacked [S]; logging/eval run at call
        granularity."""
        bs = self.train_cfg.train_batch_size
        s = self.steps_per_call
        batches = list(self.dataset.train_batches(bs))
        # Group into scan chunks; pad the tail with zero-weight batches,
        # which the step body treats as full no-ops (no param/optimizer/step
        # change), so scanned epochs match per-step epochs exactly.
        while len(batches) % s != 0:
            last = batches[-1]
            batches.append(
                Batch(src=last.src, rel=last.rel, dst=last.dst,
                      weight=np.zeros_like(last.weight))
            )

        last_log_time = time.time()
        last_log_step = self.dispatch_step
        for lo in range(0, len(batches), s):
            group = batches[lo : lo + s]
            src_s = jnp.asarray(np.stack([b.src for b in group]))
            rel_s = jnp.asarray(np.stack([b.rel for b in group]))
            dst_s = jnp.asarray(np.stack([b.dst for b in group]))
            w_s = jnp.asarray(np.stack([b.weight for b in group]))
            if self.mesh is not None:
                from relgat_projector_tpu.parallel import place_scan_batch

                src_s, rel_s, dst_s, w_s = place_scan_batch(
                    self.mesh, src_s, rel_s, dst_s, w_s
                )
            self.state, metrics = self._scan_step(
                self.state, self.node_emb, self.graph, src_s, rel_s, dst_s,
                w_s,
            )
            self.dispatch_step += s

            if (
                self.dispatch_step % self.log_adapter.log_every_n_steps
                < s
            ):
                m = jax.device_get(metrics)
                now = time.time()
                window = now - last_log_time
                steps_in_window = max(1, self.dispatch_step - last_log_step)
                last_log_time = now
                last_log_step = self.dispatch_step
                finite = np.asarray(m["finite"])
                losses = np.asarray(m["loss"])
                avg_loss = (
                    float(losses[finite].mean()) if finite.any() else 0.0
                )

                def wmean(key):
                    # Window MEAN over the finite steps (skipped and
                    # zero-weight tail steps carry garbage point values) —
                    # the [-1] element alone made scanned logs needlessly
                    # noisy at steps_per_call=8 while loss already window-
                    # averaged.
                    v = np.asarray(m[key])
                    return float(v[finite].mean()) if finite.any() else 0.0

                log = {
                    "epoch": epoch,
                    "train/loss_step": avg_loss,
                    "train/grad_norm": wmean("grad_norm"),
                    "train/lr": float(np.asarray(m["lr"])[-1]),
                    "train/step_time": window / steps_in_window,
                    "train/edges_per_sec": (
                        self.graph.num_real_edges
                        * self.model_cfg.gat_num_layers
                        * steps_in_window / window
                        if window > 0 else 0.0
                    ),
                    "train/mrr": wmean("mrr"),
                    "train/pos_score_mean": wmean("pos_score_mean"),
                    "train/neg_score_mean": wmean("neg_score_mean"),
                }
                if "cosine_pos" in m:
                    log["train/cosine_pos"] = wmean("cosine_pos")
                    log["train/cosine_neg"] = wmean("cosine_neg")
                    log["train/mse"] = wmean("mse")
                for k in self.eval_ks_ranks:
                    key = f"hits@{k}"
                    if key in m:
                        log[f"train/{key}"] = wmean(key)
                nfs = int(np.asarray(m["nonfinite_scores"]).sum())
                if nfs:
                    log["train/nonfinite_scores"] = nfs
                nonfinite = int((~finite).sum())
                if nonfinite:
                    log["train/nonfinite_loss_steps"] = nonfinite
                # Reconcile the finite-step counter (reference semantics:
                # skipped steps don't count) — display only; cadence stays
                # on dispatch_step, so skips cannot drift it.
                self.global_step = int(self.state.step)
                if self._is_primary:
                    print(
                        f"\nGlobal step {self.global_step} "
                        f"loss_step: {avg_loss:.8f} "
                        f"lr: {log['train/lr']:.8f}"
                    )
                self.log_adapter.log_metrics(metrics=log, step=self.global_step)

            if (
                self.eval_every_n_steps is not None
                and self.dispatch_step % self.eval_every_n_steps < s
            ):
                # Eval syncs the device anyway; reconcile the finite-step
                # counter first so eval logs/checkpoints carry it.
                self.global_step = int(self.state.step)
                if self._run_eval_and_maybe_early_stop(epoch=epoch):
                    self.training_should_stop = True
                    return

    def _flush_logs(
        self,
        epoch: int,
        pending: List[Tuple[int, Any, float, float]],
        running_loss: float,
        running_examples: int,
    ) -> Tuple[float, int]:
        nonfinite_new = 0
        for _, m, n_valid, _ in pending:
            if bool(np.asarray(m["finite"])):
                running_loss += float(np.asarray(m["loss"])) * n_valid
                running_examples += int(n_valid)
            else:
                nonfinite_new += 1
        step_in_epoch, metrics, _, step_start = pending[-1]
        metrics = jax.device_get(metrics)
        step_time = time.time() - step_start

        # Throughput over the flushed window (edge-messages/s; SURVEY §5.1).
        now = time.time()
        window = now - getattr(self, "_last_flush_time", now)
        self._last_flush_time = now
        edges_per_sec = (
            self.graph.num_real_edges
            * self.model_cfg.gat_num_layers
            * len(pending)
            / window
            if window > 0
            else 0.0
        )

        avg_running_loss = running_loss / max(1, running_examples)
        log = {
            "epoch": epoch,
            "train/loss_step": avg_running_loss,
            "train/step_in_epoch": step_in_epoch,
            "train/grad_norm": float(metrics["grad_norm"]),
            "train/lr": float(metrics["lr"]),
            "train/step_time": step_time,
            "train/edges_per_sec": edges_per_sec,
            "train/mrr": float(metrics["mrr"]),
            "train/pos_score_mean": float(metrics["pos_score_mean"]),
            "train/neg_score_mean": float(metrics["neg_score_mean"]),
        }
        if "cosine_pos" in metrics:
            log["train/cosine_pos"] = float(metrics["cosine_pos"])
            log["train/cosine_neg"] = float(metrics["cosine_neg"])
            log["train/mse"] = float(metrics["mse"])
        for k in self.eval_ks_ranks:
            log[f"train/hits@{k}"] = float(metrics.get(f"hits@{k}", 0.0))
        if nonfinite_new:
            log["train/nonfinite_loss_steps"] = nonfinite_new
        nfs = int(metrics.get("nonfinite_scores", 0))
        if nfs:
            log["train/nonfinite_scores"] = nfs

        if self._is_primary:
            print(
                f"\nGlobal step {self.global_step} "
                f"grad_norm {log['train/grad_norm']:.8f} "
                f"loss_step: {avg_running_loss:.8f} "
                f"lr: {log['train/lr']:.8f} "
                f"step_time {step_time}"
            )
        self.log_adapter.log_metrics(metrics=log, step=self.global_step)
        # Reconcile with the device's finite-step counter.
        self.global_step = int(self.state.step)
        # Fresh window (the reference reset its example counter to 1 —
        # trainer:853 — skewing every window average by one; fixed here).
        return 0.0, 0

    # ------------------------------------------------------------------
    # Eval plumbing + early stop (reference ``trainer:678-769``)
    # ------------------------------------------------------------------
    def _run_eval_and_maybe_early_stop(self, *, epoch: int) -> bool:
        mrr, hits, eval_loss, cos_pos, cos_neg, mse = self.evaluate(
            self.eval_ks_ranks
        )
        metrics = {"epoch": epoch, "eval/loss": eval_loss, "eval/mrr": mrr}
        metrics.update(getattr(self, "_last_eval_extra", {}))
        if cos_pos is not None:
            metrics["eval/cosine_pos"] = cos_pos
        if cos_neg is not None:
            metrics["eval/cosine_neg"] = cos_neg
        if mse is not None:
            metrics["eval/mse"] = mse
        for k, v in hits.items():
            metrics[f"eval/hits@{k}"] = v
        self.log_adapter.log_metrics(metrics=metrics, step=self.global_step)
        return self._on_eval_end(mrr, cos_pos)

    def _on_eval_end(self, mrr: float, cosine: Optional[float]) -> bool:
        if cosine is not None:
            metric_value, upper_is_better = cosine, False
        else:
            metric_value, upper_is_better = mrr, True

        if self.best_metric_value is None:
            improved = True
        elif upper_is_better:
            improved = metric_value > self.best_metric_value
        else:
            improved = metric_value < self.best_metric_value

        if improved:
            self.best_metric_value = metric_value
            # Reset the patience counter BEFORE saving so the loop-state
            # sidecar written with the checkpoint carries the post-eval
            # truth.
            self._no_improve_steps = 0
            # Save gating on the DISPATCH counter (deterministic under
            # non-finite skips); checkpoint names carry the finite
            # global_step (reference naming, ``trainer:728-729``). The gate
            # is a WINDOW of width steps_per_call — the same window the eval
            # cadence uses — so scanned dispatch (where dispatch_step moves
            # in strides of s and may never hit an exact multiple) still
            # checkpoints every improved eval. With steps_per_call=1 this
            # reduces to exact divisibility.
            if (
                self.storage.save_every_n_steps is not None
                and self.dispatch_step % self.storage.save_every_n_steps
                < self.steps_per_call
            ):
                self.best_ckpt_dir = f"best_checkpoint_{self.global_step}"
                self._save_checkpoint(subdir=self.best_ckpt_dir)
                self.storage.prune_checkpoints()
                self.log_adapter.log_metrics(
                    metrics={"checkpoint/step": self.global_step},
                    step=self.global_step,
                )
        else:
            self._no_improve_steps += 1

        if (
            self.early_stop_patience is not None
            and self._no_improve_steps >= self.early_stop_patience
        ):
            print(
                "\n  Early-stopping triggered - no improvement for "
                f"{self.early_stop_patience} evaluation steps."
            )
            self.training_should_stop = True
            return True
        return False

    def _log_begin_information(self):
        self.log_adapter.log_metrics(
            metrics={
                "scheduler/total_steps": self.total_steps,
                "scheduler/warmup_steps": self.warmup_steps,
                "scheduler/type": self.train_cfg.lr_scheduler,
                "config/use_self_adv_neg": float(self.train_cfg.use_self_adv_neg),
                "config/self_adv_alpha": float(self.train_cfg.self_adv_alpha),
                "train/base_lr": self.train_cfg.lr,
            },
            step=self.global_step,
        )

    def _save_checkpoint(self, subdir: Optional[str]) -> str:
        from relgat_projector_tpu.config import Defaults

        prunable = subdir is not None
        if subdir is None:
            subdir = (
                f"relgat_"
                f"scorer-{self.model_cfg.scorer_type}_"
                f"lrscheduler-{self.train_cfg.lr_scheduler}"
            )
        if not self._is_primary:
            # Exactly one writer per job: non-primary processes skip the
            # write (N processes racing the same dirs corrupts checkpoints)
            # but return the same path so loop bookkeeping stays aligned.
            return str(self.storage.save_dir / subdir)
        return self.storage.save_checkpoint(
            subdir=subdir,
            state=self.state,
            model_cfg=self.model_cfg,
            # Periodic (best) checkpoints write the train state off-thread;
            # the final save is synchronous.
            async_write=prunable,
            files=[
                (
                    Defaults.TRAINING_CONFIG_FILE_NAME,
                    self.run_config.to_dict(),
                ),
                (
                    Defaults.TRAINING_CONFIG_REL_TO_IDX,
                    self.dataset.rel2idx,
                ),
                (
                    RelGATStorage.LOOP_STATE_FILE,
                    {
                        "best_metric_value": self.best_metric_value,
                        "no_improve_steps": self._no_improve_steps,
                        "best_ckpt_dir": self.best_ckpt_dir,
                        "dispatch_step": self.dispatch_step,
                    },
                ),
            ],
            prunable=prunable,
        )
