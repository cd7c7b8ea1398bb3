"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY §4 item 4):
the sharded train step must match single-device numerics, and the driver
entry points must work."""

import numpy as np
import jax
import jax.numpy as jnp

from relgat_projector_tpu.config import ModelConfig, TrainConfig
from relgat_projector_tpu.data.graph import build_graph, pad_node_embeddings
from relgat_projector_tpu.models.model import init_model
from relgat_projector_tpu.parallel import (
    make_mesh,
    place_batch,
    place_graph,
    place_replicated,
)
from relgat_projector_tpu.schedules import make_lr_schedule
from relgat_projector_tpu.train.state import create_train_state, make_optimizer
from relgat_projector_tpu.train.step import make_train_step


def _setup(num_nodes=120, num_edges=640, num_rel=5, emb_dim=32, b=64):
    rng = np.random.default_rng(0)
    cfg = ModelConfig(
        in_dim=emb_dim, num_rel=num_rel, gat_out_dim=16, gat_heads=2,
        gat_num_layers=2, dropout=0.0, project_to_input_size=True,
        projection_layers=2,
    )
    graph = build_graph(
        rng.integers(0, num_nodes, num_edges),
        rng.integers(0, num_nodes, num_edges),
        rng.integers(0, num_rel, num_edges),
        num_nodes=num_nodes,
    )
    emb = rng.standard_normal((num_nodes, emb_dim)).astype(np.float32)
    node_emb = jnp.asarray(pad_node_embeddings(emb, graph.num_nodes))
    tc = TrainConfig(
        train_batch_size=b, num_neg=4, lr=1e-3, grad_clip_norm=1.0,
        use_self_adv_neg=True, eval_ks_ranks=(1, 2), warmup_steps=0,
        lr_scheduler="constant",
    )
    schedule = make_lr_schedule(tc.lr, "constant", 100, 0)
    optimizer = make_optimizer(tc, schedule)
    params = init_model(jax.random.PRNGKey(0), cfg)
    batch = (
        jnp.asarray(rng.integers(0, num_nodes, b), jnp.int32),
        jnp.asarray(rng.integers(0, num_rel, b), jnp.int32),
        jnp.asarray(rng.integers(0, num_nodes, b), jnp.int32),
        jnp.ones((b,), jnp.float32),
    )
    return cfg, tc, schedule, optimizer, params, node_emb, graph, batch


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg, tc, schedule, optimizer, params, node_emb, graph, batch = _setup()
    step_fn = make_train_step(cfg, tc, optimizer, schedule)

    # 4 x 2 mesh: DP over batch, edge partitioning over graph. Place copies
    # BEFORE running the donating step so buffers are not shared.
    mesh = make_mesh(data=4, graph=2)
    s2 = place_replicated(
        mesh, create_train_state(params, optimizer, jax.random.PRNGKey(1))
    )
    emb_r = place_replicated(mesh, node_emb)
    graph_s = place_graph(mesh, graph)
    batch_s = place_batch(mesh, *batch)

    # Single device — fresh buffers (device_put aliases the device-0 shard,
    # so donation would otherwise delete s2's replicated copy).
    params1 = jax.tree_util.tree_map(lambda a: jnp.array(np.asarray(a)), params)
    s1 = create_train_state(params1, optimizer, jax.random.PRNGKey(1))
    s1_out, m1 = step_fn(s1, node_emb, graph, *batch)

    s2_out, m2 = step_fn(s2, emb_r, graph_s, *batch_s)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1_out.params),
        jax.tree_util.tree_leaves(s2_out.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_sharded_multi_step_training_stays_finite():
    cfg, tc, schedule, optimizer, params, node_emb, graph, batch = _setup()
    step_fn = make_train_step(cfg, tc, optimizer, schedule)
    mesh = make_mesh(data=2, graph=4)
    state = place_replicated(
        mesh, create_train_state(params, optimizer, jax.random.PRNGKey(2))
    )
    emb_r = place_replicated(mesh, node_emb)
    graph_s = place_graph(mesh, graph)
    batch_s = place_batch(mesh, *batch)
    losses = []
    for _ in range(5):
        state, m = step_fn(state, emb_r, graph_s, *batch_s)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 5


def test_trainer_with_mesh_matches_single_device():
    """Full trainer on a 4x2 mesh == single-device trainer numerics."""
    from relgat_projector_tpu.config import (
        MeshConfig,
        RunConfig,
        TrainConfig,
    )
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=160, num_edges=1600, num_rel=4, emb_dim=16, seed=0
    )

    def build(mesh_cfg):
        run = RunConfig(
            model=ModelConfig(
                in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
                gat_num_layers=1, dropout=0.0, project_to_input_size=True,
                projection_layers=1,
            ),
            train=TrainConfig(
                epochs=1, train_batch_size=64, eval_batch_size=64,
                num_neg=4, lr=1e-3, lr_scheduler="constant",
                warmup_steps=0, eval_ks_ranks=(1, 2), seed=3,
                log_every_n_steps=10_000, out_dir="/tmp/relgat-mesh-test",
            ),
            mesh=mesh_cfg,
        )
        return RelGATTrainer(
            run, node2emb, rel2idx, triplets, log_to_console=False
        )

    t1 = build(MeshConfig(data_axis=1, graph_axis=1))
    t2 = build(MeshConfig(data_axis=4, graph_axis=2))
    assert t2.mesh is not None

    t1._single_epoch(1, 1)
    t2._single_epoch(1, 1)
    m1 = t1.evaluate()
    m2 = t2.evaluate()
    np.testing.assert_allclose(m1[0], m2[0], rtol=1e-4)  # MRR
    np.testing.assert_allclose(m1[2], m2[2], rtol=1e-4)  # loss
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
        )


def test_graft_entry_points():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (128,)
    assert np.isfinite(np.asarray(out[0])).all()

    __graft_entry__.dryrun_multichip(8)


def test_trainer_gspmd_mode_matches_single_device():
    """mesh_propagate='gspmd' (placement-only XLA path) stays supported and
    exact now that 'halo' is the default."""
    from relgat_projector_tpu.config import MeshConfig, RunConfig
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=160, num_edges=1600, num_rel=4, emb_dim=16, seed=0
    )

    def build(mesh_cfg):
        run = RunConfig(
            model=ModelConfig(
                in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
                gat_num_layers=1, dropout=0.0, project_to_input_size=True,
                projection_layers=1, mesh_propagate="gspmd",
            ),
            train=TrainConfig(
                epochs=1, train_batch_size=64, eval_batch_size=64,
                num_neg=4, lr=1e-3, lr_scheduler="constant",
                warmup_steps=0, eval_ks_ranks=(1, 2), seed=3,
                log_every_n_steps=10_000, out_dir="/tmp/relgat-gspmd-test",
            ),
            mesh=mesh_cfg,
        )
        return RelGATTrainer(
            run, node2emb, rel2idx, triplets, log_to_console=False
        )

    t1 = build(MeshConfig())
    t2 = build(MeshConfig(data_axis=4, graph_axis=2))
    assert t2.graph.blocked is None  # plain sharded edge lists
    t1._single_epoch(1, 1)
    t2._single_epoch(1, 1)
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
        )
