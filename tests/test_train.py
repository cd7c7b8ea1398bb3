"""Trainer runtime: optimizer parity with torch Adam, jitted step semantics
(non-finite skip), checkpoint/resume, end-to-end smoke (SURVEY §4 item 5)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from relgat_projector_tpu.config import ModelConfig, RunConfig, TrainConfig
from relgat_projector_tpu.data import RelGATData, generate_synthetic_kg
from relgat_projector_tpu.schedules import make_lr_schedule
from relgat_projector_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from relgat_projector_tpu.train.step import make_train_step
from relgat_projector_tpu.train.trainer import RelGATTrainer


def test_optimizer_matches_torch_adam():
    """optax chain == torch.optim.Adam(lr, weight_decay) + clip, 5 steps."""
    w0 = np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32)
    grads_seq = [
        np.random.default_rng(i + 1).standard_normal((4, 3)).astype(np.float32)
        for i in range(5)
    ]

    # torch reference
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([wt], lr=1e-2, weight_decay=0.1)
    for g in grads_seq:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([wt], max_norm=1.0)
        opt.step()

    # ours
    tc = TrainConfig(lr=1e-2, weight_decay=0.1, grad_clip_norm=1.0,
                     lr_scheduler="constant", warmup_steps=0)
    sched = make_lr_schedule(1e-2, "constant", 1000, 0)
    optimizer = make_optimizer(tc, sched)
    params = {"w": jnp.asarray(w0)}
    opt_state = optimizer.init(params)
    for g in grads_seq:
        updates, opt_state = optimizer.update(
            {"w": jnp.asarray(g)}, opt_state, params
        )
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=2e-4, atol=1e-6
    )


def _tiny_trainer(tmp_path, **overrides):
    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=300, num_edges=3000, num_rel=4, emb_dim=32, seed=0
    )
    defaults = dict(
        epochs=2,
        train_batch_size=128,
        num_neg=4,
        lr=5e-3,
        lr_scheduler="constant",
        warmup_steps=0,
        log_every_n_steps=50,
        out_dir=str(tmp_path),
        eval_ks_ranks=(1, 2, 4),
        seed=7,
    )
    defaults.update(overrides)
    run = RunConfig(
        model=ModelConfig(
            in_dim=32, num_rel=4, gat_out_dim=16, gat_heads=2,
            gat_num_layers=1, dropout=0.0, project_to_input_size=True,
            projection_layers=1, projection_dropout=0.0,
        ),
        train=TrainConfig(**defaults),
    )
    return RelGATTrainer(
        run, node2emb, rel2idx, triplets, log_to_console=False
    )


def test_nonfinite_loss_skips_update():
    tr = _tiny_trainer("/tmp/relgat-test-nf")
    params_before = jax.device_get(tr.state.params)  # state gets donated
    bad_emb = tr.node_emb.at[0, 0].set(jnp.nan)
    batch = next(iter(tr.dataset.train_batches(128)))
    new_state, metrics = tr._train_step(
        tr.state, bad_emb, tr.graph,
        jnp.asarray(batch.src), jnp.asarray(batch.rel),
        jnp.asarray(batch.dst), jnp.asarray(batch.weight),
    )
    assert not bool(metrics["finite"])
    assert int(new_state.step) == 0
    assert int(new_state.nonfinite_steps) == 1
    # params unchanged
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(params_before),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_end_to_end_training_improves(tmp_path):
    """BASELINE smoke: loss decreases and eval MRR beats random on the
    structured synthetic KG."""
    tr = _tiny_trainer(tmp_path, epochs=12, lr=1e-2)
    mrr0, hits0, loss0, cos0, _, _ = tr.evaluate()
    tr.train()
    mrr1, hits1, loss1, cos1, _, _ = tr.evaluate()

    k = tr.train_cfg.num_neg
    random_mrr = sum(1.0 / r for r in range(1, k + 2)) / (k + 1)
    assert mrr1 > random_mrr + 0.05, (mrr0, mrr1, random_mrr)
    assert mrr1 > mrr0
    assert cos1 < cos0  # reconstruction improves
    assert loss1 < loss0


def test_checkpoint_resume_roundtrip(tmp_path):
    tr = _tiny_trainer(tmp_path, epochs=1)
    tr.train()
    step_after = int(tr.state.step)
    assert step_after > 0

    # Fresh trainer, resume from the final checkpoint.
    tr2 = _tiny_trainer(tmp_path, epochs=1)
    assert int(tr2.state.step) == 0
    assert tr2.maybe_resume()
    assert int(tr2.state.step) == step_after
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.state.params),
        jax.tree_util.tree_leaves(tr2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.state.opt_state),
        jax.tree_util.tree_leaves(tr2.state.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scanned_logging_block_executes(tmp_path, capsys):
    """The scanned path's log block (hits@k, cosine metrics, throughput)
    runs and emits the per-step metric namespace."""
    tr = _tiny_trainer(tmp_path, epochs=1, steps_per_call=4,
                       log_every_n_steps=4)
    tr.log_adapter.log_to_console = True
    tr._single_epoch(1, 1)
    out = capsys.readouterr().out
    for key in ("train/loss_step", "train/edges_per_sec", "train/mrr",
                "train/hits@1", "train/cosine_pos", "train/mse"):
        assert key in out, key


def test_scanned_point_metrics_are_window_means(tmp_path):
    """Scanned-mode logs report window MEANS over the finite steps for the
    point metrics (mrr/grad_norm/hits), not the [-1] element (VERDICT r3
    weak 5)."""
    tr = _tiny_trainer(tmp_path, epochs=1, steps_per_call=4,
                       log_every_n_steps=4)
    real = tr._scan_step

    def wrapped(state, node_emb, graph, *stacked):
        state, m = real(state, node_emb, graph, *stacked)
        m = dict(m)
        # Known stacked values; last step marked non-finite, so the mean
        # must cover exactly the first three and ignore the 99s.
        m["finite"] = jnp.asarray([True, True, True, False])
        m["mrr"] = jnp.asarray([0.2, 0.4, 0.6, 99.0])
        m["grad_norm"] = jnp.asarray([1.0, 2.0, 3.0, 99.0])
        return state, m

    tr._scan_step = wrapped
    logged = []
    tr.log_adapter.log_metrics = (
        lambda metrics, step: logged.append(metrics)
    )
    tr._single_epoch(1, 1)
    rows = [m for m in logged if "train/mrr" in m]
    assert rows, "scanned epoch logged no train metrics"
    np.testing.assert_allclose(rows[0]["train/mrr"], 0.4, rtol=1e-6)
    np.testing.assert_allclose(rows[0]["train/grad_norm"], 2.0, rtol=1e-6)


def test_resume_after_scanned_training(tmp_path):
    """Scanned trainer saves a resumable state; a per-step trainer can pick
    it up (dispatch modes are interchangeable)."""
    tr = _tiny_trainer(tmp_path, epochs=1, steps_per_call=8)
    tr.train()
    step_after = int(tr.state.step)

    tr2 = _tiny_trainer(tmp_path, epochs=1)  # per-step mode
    assert tr2.maybe_resume()
    assert int(tr2.state.step) == step_after
    tr2._single_epoch(1, 1)  # continues without error
    assert int(tr2.state.step) > step_after


def test_scanned_save_gate_is_a_window(tmp_path):
    """Under scan dispatch (steps_per_call=8, save_every=100) dispatch_step
    moves in strides of 8 and may never hit an exact multiple of 100; an
    improved eval at dispatch 104 must still checkpoint (VERDICT r2 weak 6),
    while per-step mode keeps the exact gate."""
    tr = _tiny_trainer(tmp_path / "scan", epochs=1, steps_per_call=8,
                       save_every_n_steps=100)
    tr.dispatch_step = 104  # eval window fired at 104 (104 % 100 < 8)
    assert not tr._on_eval_end(mrr=0.9, cosine=None)
    saved = [d for d in os.listdir(tmp_path / "scan")
             if d.startswith("best_checkpoint")]
    assert saved, "improved eval at dispatch 104 must save under scan mode"

    tr1 = _tiny_trainer(tmp_path / "step", epochs=1,
                        save_every_n_steps=100)
    tr1.dispatch_step = 104  # per-step mode: 104 is NOT a save step
    assert not tr1._on_eval_end(mrr=0.9, cosine=None)
    assert not [d for d in os.listdir(tmp_path / "step")
                if d.startswith("best_checkpoint")]
    tr1.dispatch_step = 200
    assert not tr1._on_eval_end(mrr=0.95, cosine=None)
    assert [d for d in os.listdir(tmp_path / "step")
            if d.startswith("best_checkpoint")]


def test_resume_restores_early_stop_state(tmp_path):
    """maybe_resume must recover best_metric_value / patience counter /
    best_ckpt_dir / dispatch_step from the loop-state sidecar (VERDICT r2
    weak 7) so a resumed run doesn't re-save a 'best' checkpoint on its
    first eval or forget its early-stop history."""
    tr = _tiny_trainer(tmp_path, epochs=1, save_every_n_steps=1,
                       early_stop_patience=5)
    tr.dispatch_step = 10
    tr.global_step = 10
    assert not tr._on_eval_end(mrr=0.6, cosine=None)   # best=0.6, saves
    assert not tr._on_eval_end(mrr=0.5, cosine=None)   # no improvement
    assert tr._no_improve_steps == 1
    final_dir = tr._save_checkpoint(subdir=None)  # carries the sidecar
    tr.storage.wait_for_writes()

    tr2 = _tiny_trainer(tmp_path, epochs=1, save_every_n_steps=1,
                        early_stop_patience=5)
    assert tr2.maybe_resume(final_dir)
    assert tr2.best_metric_value == pytest.approx(0.6)
    assert tr2._no_improve_steps == 1
    assert tr2.best_ckpt_dir == tr.best_ckpt_dir
    assert tr2.dispatch_step == 10
    # A worse eval after resume must NOT count as an improvement.
    assert not tr2._on_eval_end(mrr=0.55, cosine=None)
    assert tr2._no_improve_steps == 2


def test_checkpoint_pruning_works(tmp_path):
    """FIFO pruning keeps max_checkpoints dirs (fixes reference quirk 4)."""
    tr = _tiny_trainer(tmp_path, max_checkpoints=2)
    for i in range(4):
        tr.storage.save_checkpoint(
            f"best_checkpoint_{i}", tr.state, tr.model_cfg, files=[]
        )
        tr.storage.prune_checkpoints()
    kept = sorted(
        d for d in os.listdir(tmp_path) if d.startswith("best_checkpoint")
    )
    assert kept == ["best_checkpoint_2", "best_checkpoint_3"]


def test_early_stop_counts_and_direction(tmp_path):
    tr = _tiny_trainer(tmp_path, early_stop_patience=2)
    # cosine available -> lower is better
    assert not tr._on_eval_end(mrr=0.5, cosine=0.5)
    assert not tr._on_eval_end(mrr=0.5, cosine=0.6)  # worse
    assert tr._on_eval_end(mrr=0.5, cosine=0.7)      # worse again -> stop
    assert tr.training_should_stop

    tr2 = _tiny_trainer(tmp_path, early_stop_patience=2)
    # MRR fallback -> HIGHER is better (fixed direction, SURVEY quirk 2)
    assert not tr2._on_eval_end(mrr=0.5, cosine=None)
    assert not tr2._on_eval_end(mrr=0.6, cosine=None)  # improvement
    assert tr2._no_improve_steps == 0

    # patience=None disables early stopping (fixes reference quirk 3)
    tr3 = _tiny_trainer(tmp_path, early_stop_patience=None)
    for _ in range(5):
        assert not tr3._on_eval_end(mrr=0.5, cosine=0.9)


def test_scanned_steps_match_single_steps(tmp_path):
    """steps_per_call > 1 (lax.scan) must produce the same params as the
    per-step path for the same seed/data."""
    tr1 = _tiny_trainer(tmp_path, epochs=1)
    tr2 = _tiny_trainer(tmp_path, epochs=1, steps_per_call=4)
    assert tr2._scan_step is not None
    tr1._single_epoch(1, 1)
    tr2._single_epoch(1, 1)
    assert int(tr1.state.step) == int(tr2.state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(tr1.state.params),
        jax.tree_util.tree_leaves(tr2.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    # and it keeps learning over multiple epochs
    mrr0 = tr2.evaluate()[0]
    for ep in range(4):
        tr2._single_epoch(ep + 2, 5)
    assert np.isfinite(tr2.evaluate()[0])


def test_remat_matches_no_remat():
    """jax.checkpoint layers: identical loss and grads, less live memory."""
    import jax.numpy as jnp
    from relgat_projector_tpu.data.graph import build_graph, pad_node_embeddings
    from relgat_projector_tpu.models.model import init_model, single_gat_step

    rng = np.random.default_rng(0)
    n, e, r, d = 60, 300, 4, 16
    graph = build_graph(
        rng.integers(0, n, e), rng.integers(0, n, e), rng.integers(0, r, e),
        num_nodes=n,
    )
    x = jnp.asarray(pad_node_embeddings(
        rng.standard_normal((n, d)).astype(np.float32), graph.num_nodes))
    cfg = ModelConfig(in_dim=d, num_rel=r, gat_out_dim=8, gat_heads=2,
                      gat_num_layers=2, dropout=0.0,
                      project_to_input_size=False)
    cfg_r = ModelConfig(**{**cfg.to_dict(), "remat": True})
    params = init_model(jax.random.PRNGKey(0), cfg)

    def loss(p, c):
        return jnp.sum(jnp.square(single_gat_step(p, c, x, graph)))

    l0, g0 = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, cfg_r))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_cli_synthetic_smoke(tmp_path):
    from relgat_projector_tpu import cli

    cli.main([
        "--synthetic", "--synthetic-nodes", "200", "--synthetic-edges", "1000",
        "--synthetic-rels", "3", "--synthetic-dim", "16",
        "--epochs", "1", "--batch-size", "64", "--gat-out-dim", "8",
        "--heads", "2", "--num-neg", "3", "--project-to-input-size",
        "--save-dir", str(tmp_path), "--log-every-n-steps", "1000",
    ])
    dirs = os.listdir(tmp_path)
    assert any(d.startswith("relgat_scorer-distmult") for d in dirs)


def test_cli_config_file_layer(tmp_path):
    """SURVEY §5.6 precedence CLI > config file > defaults: the serialized
    training-config.json written to every checkpoint feeds back in via
    --config, and explicit flags still override it."""
    import json

    from relgat_projector_tpu import cli
    from relgat_projector_tpu.config import (
        ModelConfig, RunConfig, TrainConfig, MeshConfig,
    )

    base = RunConfig(
        model=ModelConfig(
            in_dim=32, num_rel=4, gat_out_dim=24, gat_heads=3,
            gat_num_layers=2, dropout=0.15, scorer_type="transe",
            use_pallas=True, scan_segments=4,
        ),
        train=TrainConfig(
            epochs=7, train_batch_size=96, lr=3e-4, num_neg=5,
            lr_scheduler="cosine", steps_per_call=8, seed=11,
            out_dir=str(tmp_path / "out"),
        ),
        mesh=MeshConfig(data_axis=2, graph_axis=4),
        run_name="from-file",
    )
    cfg_path = tmp_path / "training-config.json"
    cfg_path.write_text(base.to_json())

    # File layer only: everything comes from the file.
    args = cli.get_args(["--config", str(cfg_path), "--synthetic"])
    rc = cli.build_run_config(args)
    assert rc.model.gat_out_dim == 24 and rc.model.gat_heads == 3
    assert rc.model.scorer_type == "transe" and rc.model.use_pallas
    assert rc.model.scan_segments == 4
    assert rc.train.epochs == 7 and rc.train.train_batch_size == 96
    assert rc.train.lr == 3e-4 and rc.train.lr_scheduler == "cosine"
    assert rc.train.steps_per_call == 8 and rc.train.seed == 11
    assert rc.mesh.graph_axis == 4 and rc.mesh.data_axis == 2
    assert rc.run_name == "from-file"

    # Explicit flags override the file; untouched fields keep file values.
    args2 = cli.get_args([
        "--config", str(cfg_path), "--synthetic",
        "--lr", "1e-2", "--heads", "6", "--mesh-graph", "1",
    ])
    rc2 = cli.build_run_config(args2)
    assert rc2.train.lr == 1e-2
    assert rc2.model.gat_heads == 6
    assert rc2.mesh.graph_axis == 1
    assert rc2.model.gat_out_dim == 24       # still from the file
    assert rc2.train.epochs == 7             # still from the file


def test_eval_metric_namespace_superset_of_reference():
    """The logged eval/* keys must cover the reference's eval namespace
    (reference ``trainer/relgat_projector.py:323-376``, SURVEY §5.5)."""
    from relgat_projector_tpu.config import ModelConfig, RunConfig, TrainConfig
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=120, num_edges=900, num_rel=4, emb_dim=16, seed=0
    )
    run = RunConfig(
        model=ModelConfig(
            in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
            gat_num_layers=1, dropout=0.0, project_to_input_size=True,
            projection_layers=1,
        ),
        train=TrainConfig(
            epochs=1, train_batch_size=64, eval_batch_size=64, num_neg=4,
            lr=1e-3, lr_scheduler="constant", warmup_steps=0,
            eval_ks_ranks=(1, 2), seed=3, log_every_n_steps=10_000,
            out_dir="/tmp/relgat-evalns-test",
        ),
    )
    t = RelGATTrainer(run, node2emb, rel2idx, triplets, log_to_console=False)

    logged = {}
    orig = t.log_adapter.log_metrics
    t.log_adapter.log_metrics = (
        lambda metrics, step=None: logged.update(metrics)
    )
    try:
        t._run_eval_and_maybe_early_stop(epoch=1)
    finally:
        t.log_adapter.log_metrics = orig

    reference_namespace = {
        "eval/loss", "eval/mrr", "eval/hits@1", "eval/hits@2",
        "eval/cosine_pos", "eval/cosine_neg", "eval/mse",
        "eval/pos_score_mean", "eval/neg_score_mean",
        "eval/cosine_mean_batch_pos", "eval/cosine_mean_batch_neg",
        "eval/mse_mean_batch",
    }
    missing = reference_namespace - set(logged)
    assert not missing, f"missing eval keys: {missing}"


def test_hoisted_eval_matches_per_batch_recompute():
    """`evaluate()` computes the GAT stack once per call and scores every
    batch against it; that must equal the unhoisted `batch_forward`
    (full-graph recompute per batch, the reference's eval structure,
    ``trainer/relgat_projector.py:286-300``)."""
    from relgat_projector_tpu.config import ModelConfig, RunConfig, TrainConfig
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.train.step import batch_forward
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=150, num_edges=1200, num_rel=4, emb_dim=16, seed=1
    )
    run = RunConfig(
        model=ModelConfig(
            in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
            gat_num_layers=2, dropout=0.0, project_to_input_size=True,
            projection_layers=2,
        ),
        train=TrainConfig(
            epochs=1, train_batch_size=64, eval_batch_size=48, num_neg=4,
            lr=1e-3, lr_scheduler="constant", warmup_steps=0,
            eval_ks_ranks=(1, 2), seed=9, log_every_n_steps=10_000,
            out_dir="/tmp/relgat-evalhoist-test",
        ),
    )
    t = RelGATTrainer(run, node2emb, rel2idx, triplets, log_to_console=False)

    x = t._eval_repr(t.state.params, t.node_emb, t.graph)
    eval_rng = jax.random.fold_in(t.state.rng, 2**30)
    for bi, batch in enumerate(t.dataset.eval_batches(48)):
        rng = jax.random.fold_in(eval_rng, bi)
        dev = t._device_batch(batch)
        out = t._eval_step(t.state.params, x, t.graph, *dev, rng)
        loss_ref, fwd_ref = batch_forward(
            t.state.params, t.model_cfg, t.train_cfg, t.node_emb, t.graph,
            *dev, rng=rng, train=False,
        )
        n = float(jnp.sum(dev[3]))
        assert np.isclose(float(out["loss_sum"]), float(loss_ref) * n,
                          rtol=1e-5, atol=1e-5)
        assert np.isclose(float(out["pos_score_mean"]),
                          float(fwd_ref["pos_score_mean"]), rtol=1e-5,
                          atol=1e-6)
        assert np.isclose(float(out["neg_score_mean"]),
                          float(fwd_ref["neg_score_mean"]), rtol=1e-5,
                          atol=1e-6)


def test_scanned_cadence_under_nonfinite_skips():
    """Eval/save cadence must not drift when steps skip on non-finite
    losses in scanned mode (VERDICT round-1 weak #5): cadence counts
    DISPATCHED steps; the device finite-step counter feeds reporting only."""
    from relgat_projector_tpu.config import ModelConfig, RunConfig, TrainConfig
    from relgat_projector_tpu.data.dataset import Batch
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=200, num_edges=2400, num_rel=4, emb_dim=16, seed=0
    )
    run = RunConfig(
        model=ModelConfig(
            in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
            gat_num_layers=1, dropout=0.0, project_to_input_size=True,
            projection_layers=1,
        ),
        train=TrainConfig(
            epochs=2, train_batch_size=64, eval_batch_size=64, num_neg=4,
            lr=1e-3, lr_scheduler="constant", warmup_steps=0,
            eval_ks_ranks=(1, 2), seed=3, log_every_n_steps=4,
            eval_every_n_steps=8, steps_per_call=4,
            out_dir="/tmp/relgat-cadence-test",
        ),
    )
    t = RelGATTrainer(run, node2emb, rel2idx, triplets, log_to_console=False)
    assert t._scan_step is not None

    # Inject non-finite losses: poison the weight vector of every 4th
    # batch with +inf (keeps the batch ACTIVE — sum(w) > 0 — while making
    # the loss non-finite -> jitted skip-select, no step count).
    orig_batches = list(t.dataset.train_batches(64))
    n_batches = len(orig_batches)

    def poisoned(bs):
        for i, b in enumerate(orig_batches):
            if i % 4 == 1:
                w = b.weight.copy()
                w[0] = np.inf
                yield Batch(src=b.src, rel=b.rel, dst=b.dst, weight=w)
            else:
                yield b

    t.dataset.train_batches = poisoned

    evals = []
    orig_eval = t.evaluate
    t.evaluate = lambda ks=None: (
        evals.append(t.dispatch_step) or orig_eval(ks)
    )

    t.train(epochs=2)

    # Scan grouping pads each epoch's batch list to a multiple of
    # steps_per_call with zero-weight no-ops; those count as dispatches.
    padded_per_epoch = -(-n_batches // 4) * 4
    total_dispatch = 2 * padded_per_epoch
    assert t.dispatch_step == total_dispatch, (
        t.dispatch_step, total_dispatch
    )
    # Every 8 dispatched steps -> eval fired exactly dispatch/8 times,
    # drift-free despite the skips.
    assert len(evals) == total_dispatch // 8, (evals, total_dispatch)
    assert evals == [8 * (i + 1) for i in range(len(evals))], evals
    # The finite counter excludes the poisoned steps AND the pad no-ops.
    skipped = sum(1 for i in range(n_batches) if i % 4 == 1) * 2
    assert int(t.state.step) == 2 * n_batches - skipped
    assert int(t.state.nonfinite_steps) == skipped


def test_resume_on_mesh_trainer(tmp_path):
    """Preemption recovery under sharding: a mesh trainer (Pallas + halo)
    saves, a fresh mesh trainer resumes the full train state and the
    restored state is correctly placed (training continues)."""
    from relgat_projector_tpu.config import (
        MeshConfig, ModelConfig, RunConfig, TrainConfig,
    )
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=160, num_edges=1600, num_rel=4, emb_dim=16, seed=0
    )

    def build():
        run = RunConfig(
            model=ModelConfig(
                in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
                gat_num_layers=1, dropout=0.0, project_to_input_size=True,
                projection_layers=1, use_pallas=True,
            ),
            train=TrainConfig(
                epochs=1, train_batch_size=64, eval_batch_size=64,
                num_neg=4, lr=1e-3, lr_scheduler="constant",
                warmup_steps=0, eval_ks_ranks=(1, 2), seed=3,
                log_every_n_steps=10_000, out_dir=str(tmp_path),
            ),
            mesh=MeshConfig(data_axis=2, graph_axis=4),
        )
        return RelGATTrainer(
            run, node2emb, rel2idx, triplets, log_to_console=False
        )

    tr = build()
    tr.train()
    step_after = int(tr.state.step)
    assert step_after > 0

    tr2 = build()
    assert tr2.maybe_resume()
    assert int(tr2.state.step) == step_after
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.state.params),
        jax.tree_util.tree_leaves(tr2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # And training continues from the restored state on the mesh.
    tr2._single_epoch(1, 1)
    assert int(tr2.state.step) > step_after
