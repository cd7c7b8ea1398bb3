"""Fused Pallas kernels under the graph-sharded mesh: per-device blocked
layouts inside shard_map must match single-device Pallas numerics (forward
AND gradients), and the full trainer must run Pallas + mesh end-to-end.

This is the round-2 composition of the perf path and the scale path
(VERDICT round 1, item 1): previously ``use_pallas`` + mesh>1 hard-raised.
"""

import numpy as np
import jax
import jax.numpy as jnp

from relgat_projector_tpu.config import MeshConfig, ModelConfig, RunConfig, TrainConfig
from relgat_projector_tpu.data.blocked import build_blocked_graph
from relgat_projector_tpu.ops.pallas.kernels import relgat_propagate_pallas
from relgat_projector_tpu.ops.relgat_ops import relgat_propagate
from relgat_projector_tpu.parallel import make_mesh
from relgat_projector_tpu.parallel.pallas_sharded import (
    pallas_sharded_propagate,
    shard_blocked_graph,
)


def _case(n_pad=304, e=2000, r=6, heads=2, f=16, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_pad - 4, e).astype(np.int32)
    dst = rng.integers(0, n_pad - 4, e).astype(np.int32)
    et = rng.integers(0, r, e).astype(np.int32)
    h = jnp.asarray(rng.standard_normal((n_pad, heads, f)).astype(np.float32))
    attn = jnp.asarray(
        (rng.standard_normal((heads, r, f)) * 0.3).astype(np.float32)
    )
    bias = jnp.asarray((rng.standard_normal(r) * 0.1).astype(np.float32))
    return src, dst, et, h, attn, bias


def test_sharded_pallas_forward_matches_single_device():
    src, dst, et, h, attn, bias = _case()
    n_pad = h.shape[0]
    bg = build_blocked_graph(src, dst, et, n_pad, block_nodes=64,
                             chunk_edges=128)
    want = np.asarray(relgat_propagate_pallas(h, attn, bias, bg))

    mesh = make_mesh(data=2, graph=4)
    sbg = shard_blocked_graph(
        src, dst, et, n_pad, 4, block_nodes=64, chunk_edges=128
    ).with_mesh(mesh)
    got = np.asarray(pallas_sharded_propagate(h, attn, bias, sbg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # no-bias variant
    want2 = np.asarray(relgat_propagate_pallas(h, attn, None, bg))
    got2 = np.asarray(pallas_sharded_propagate(h, attn, None, sbg))
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)


def test_sharded_pallas_dropout_matches_single_device():
    """In-kernel dropout parity across device counts (closes the round-2
    documented hole): per-shard layouts carry GLOBAL canonical edge ids and
    every shard hashes the same seed, so masks are bitwise the
    single-device masks — fwd and grads match at rate > 0."""
    src, dst, et, h, attn, bias = _case(seed=9)
    n_pad = h.shape[0]
    bg = build_blocked_graph(src, dst, et, n_pad, block_nodes=64,
                             chunk_edges=128)
    mesh = make_mesh(data=1, graph=4)
    sbg = shard_blocked_graph(
        src, dst, et, n_pad, 4, block_nodes=64, chunk_edges=128
    ).with_mesh(mesh)
    kw = dict(attn_dropout_rate=0.3, dropout_rng=jax.random.PRNGKey(13))

    want = np.asarray(relgat_propagate_pallas(h, attn, bias, bg, **kw))
    got = np.asarray(pallas_sharded_propagate(h, attn, bias, sbg, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # Dropout actually drops.
    base = np.asarray(pallas_sharded_propagate(h, attn, bias, sbg))
    assert np.abs(base - want).max() > 1e-3

    def loss_sh(h_, a_, b_):
        return jnp.sum(jnp.sin(
            pallas_sharded_propagate(h_, a_, b_, sbg, **kw)
        ))

    def loss_1(h_, a_, b_):
        return jnp.sum(jnp.sin(
            relgat_propagate_pallas(h_, a_, b_, bg, **kw)
        ))

    gs = jax.grad(loss_sh, argnums=(0, 1, 2))(h, attn, bias)
    g1 = jax.grad(loss_1, argnums=(0, 1, 2))(h, attn, bias)
    for a, b in zip(gs, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_sharded_pallas_gradients_match_xla_single_device():
    """Grad parity vs the XLA reference on a mesh with a data axis > 1 —
    guards against shard_map transpose double-counting replicated inputs."""
    src, dst, et, h, attn, bias = _case(seed=3)
    n_pad = h.shape[0]
    mesh = make_mesh(data=2, graph=4)
    sbg = shard_blocked_graph(
        src, dst, et, n_pad, 4, block_nodes=64, chunk_edges=128
    ).with_mesh(mesh)

    def loss_sharded(h_, a_, b_):
        return jnp.sum(jnp.sin(pallas_sharded_propagate(h_, a_, b_, sbg)))

    def loss_single(h_, a_, b_):
        out = relgat_propagate(
            h_, a_, b_, jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(et), num_nodes=n_pad,
        )
        return jnp.sum(jnp.sin(out))

    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(h, attn, bias)
    g1 = jax.grad(loss_single, argnums=(0, 1, 2))(h, attn, bias)
    for a, b in zip(gs, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_sharded_pallas_empty_shard():
    """A dst range with zero edges (all edges target low node ids) must
    produce zero rows, not garbage."""
    rng = np.random.default_rng(7)
    n_pad, e, r, heads, f = 512, 300, 3, 2, 8
    src = rng.integers(0, n_pad, e).astype(np.int32)
    dst = rng.integers(0, 100, e).astype(np.int32)   # shards 2-3 empty
    et = rng.integers(0, r, e).astype(np.int32)
    h = jnp.asarray(rng.standard_normal((n_pad, heads, f)).astype(np.float32))
    attn = jnp.asarray(
        (rng.standard_normal((heads, r, f)) * 0.3).astype(np.float32)
    )

    want = np.asarray(relgat_propagate(
        h, attn, None, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
        num_nodes=n_pad,
    ))
    mesh = make_mesh(data=1, graph=4)
    sbg = shard_blocked_graph(
        src, dst, et, n_pad, 4, block_nodes=64, chunk_edges=128
    ).with_mesh(mesh)
    got = np.asarray(pallas_sharded_propagate(h, attn, None, sbg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_trainer_pallas_mesh_matches_single_device_pallas():
    """Full trainer: Pallas + 2x4 mesh == Pallas single-device numerics."""
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=160, num_edges=1600, num_rel=4, emb_dim=16, seed=0
    )

    def build(mesh_cfg):
        run = RunConfig(
            model=ModelConfig(
                in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
                gat_num_layers=2, dropout=0.0, project_to_input_size=True,
                projection_layers=1, use_pallas=True,
                mesh_propagate="replicated",
            ),
            train=TrainConfig(
                epochs=1, train_batch_size=64, eval_batch_size=64,
                num_neg=4, lr=1e-3, lr_scheduler="constant",
                warmup_steps=0, eval_ks_ranks=(1, 2), seed=3,
                log_every_n_steps=10_000,
                out_dir="/tmp/relgat-pallas-mesh-test",
            ),
            mesh=mesh_cfg,
        )
        return RelGATTrainer(
            run, node2emb, rel2idx, triplets, log_to_console=False
        )

    t1 = build(MeshConfig(data_axis=1, graph_axis=1))
    t2 = build(MeshConfig(data_axis=2, graph_axis=4))
    assert t2.mesh is not None
    from relgat_projector_tpu.parallel.pallas_sharded import (
        ShardedBlockedGraph,
    )

    assert isinstance(t2.graph.blocked, ShardedBlockedGraph)

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


def test_trainer_mesh_with_scan_dispatch():
    """steps_per_call > 1 (lax.scan dispatch) composed with the mesh +
    Pallas + halo: one epoch must match the per-step-dispatch trainer."""
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=160, num_edges=1600, num_rel=4, emb_dim=16, seed=0
    )

    def build(steps_per_call):
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
                log_every_n_steps=10_000, steps_per_call=steps_per_call,
                out_dir="/tmp/relgat-mesh-scan-test",
            ),
            mesh=MeshConfig(data_axis=2, graph_axis=4),
        )
        return RelGATTrainer(
            run, node2emb, rel2idx, triplets, log_to_console=False
        )

    t1 = build(1)
    # steps_per_call=3 is deliberately NOT divisible by data_axis=2: the
    # stacked [S, B] batch must shard on the BATCH axis, not the scan axis.
    t2 = build(3)
    assert t2._scan_step is not None and t2.mesh is not None
    t1._single_epoch(1, 1)
    t2._single_epoch(1, 1)
    assert int(t1.state.step) == int(t2.state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
        )
