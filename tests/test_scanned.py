"""Segment-scanned fused propagate (huge-graph memory bounding): lax.scan
over per-segment blocked layouts must match the single-shot Pallas path
exactly — forward, gradients, and with in-kernel dropout active — and the
trainer must run end-to-end with ModelConfig.scan_segments."""

import numpy as np
import jax
import jax.numpy as jnp

from relgat_projector_tpu.data.blocked import build_blocked_graph
from relgat_projector_tpu.data.graph import build_graph
from relgat_projector_tpu.ops.pallas.kernels import (
    relgat_propagate_pallas,
    relgat_propagate_pallas_scanned,
)
from relgat_projector_tpu.data.blocked import build_scanned_graph


def _case(n_pad=304, e=2500, r=6, heads=2, f=16, seed=0):
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


def test_scanned_matches_single_shot_fwd_and_grad():
    src, dst, et, h, attn, bias = _case()
    n_pad = h.shape[0]
    bg = build_blocked_graph(src, dst, et, n_pad, block_nodes=64,
                             chunk_edges=128)
    sbg = build_scanned_graph(
        src, dst, et, n_pad, 4, block_nodes=64, chunk_edges=128
    )

    want = np.asarray(relgat_propagate_pallas(h, attn, bias, bg))
    got = np.asarray(relgat_propagate_pallas_scanned(h, attn, bias, sbg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def loss_sc(h_, a_, b_):
        return jnp.sum(jnp.sin(
            relgat_propagate_pallas_scanned(h_, a_, b_, sbg)
        ))

    def loss_1(h_, a_, b_):
        return jnp.sum(jnp.sin(relgat_propagate_pallas(h_, a_, b_, bg)))

    gs = jax.grad(loss_sc, argnums=(0, 1, 2))(h, attn, bias)
    g1 = jax.grad(loss_1, argnums=(0, 1, 2))(h, attn, bias)
    for a, b in zip(gs, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )

    # Under jit as well (the trainer always runs it jitted).
    got_j = np.asarray(jax.jit(
        lambda *xs: relgat_propagate_pallas_scanned(*xs, sbg)
    )(h, attn, bias))
    np.testing.assert_allclose(got_j, want, rtol=1e-5, atol=1e-5)


def test_scanned_dropout_matches_xla_bitwise():
    """The scanned layouts hash GLOBAL canonical edge ids (positions in
    the edge array fed to build), which is the same id space the XLA path
    uses (arange over the dst-sorted edges) — so for dst-sorted input the
    masks are IDENTICAL and fwd + grads must match the XLA path exactly,
    proving the dst-partitioned forward and src-partitioned backward
    replay the same mask."""
    from relgat_projector_tpu.ops.relgat_ops import relgat_propagate

    src, dst, et, h, attn, bias = _case(seed=5)
    n_pad = h.shape[0]
    n = n_pad - 4
    order = np.argsort(dst, kind="stable")
    src, dst, et = src[order], dst[order], et[order]
    sbg = build_scanned_graph(
        src, dst, et, n_pad, 3, block_nodes=64, chunk_edges=128
    )
    key = jax.random.PRNGKey(11)
    kw = dict(attn_dropout_rate=0.3, dropout_rng=key)

    want = relgat_propagate(
        h, attn, bias, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
        num_nodes=n_pad, edges_sorted_by_dst=True, **kw,
    )
    got = relgat_propagate_pallas_scanned(h, attn, bias, sbg, **kw)
    np.testing.assert_allclose(
        np.asarray(got)[:n], np.asarray(want)[:n], rtol=1e-5, atol=1e-6
    )
    # Dropout actually drops.
    base = relgat_propagate_pallas_scanned(h, attn, bias, sbg)
    assert np.abs(np.asarray(base) - np.asarray(got)).max() > 1e-3

    def loss_sc(h_, a_, b_):
        return jnp.sum(jnp.sin(relgat_propagate_pallas_scanned(
            h_, a_, b_, sbg, **kw)[:n]))

    def loss_x(h_, a_, b_):
        return jnp.sum(jnp.sin(relgat_propagate(
            h_, a_, b_, jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(et), num_nodes=n_pad, edges_sorted_by_dst=True,
            **kw)[:n]))

    gs = jax.grad(loss_sc, argnums=(0, 1, 2))(h, attn, bias)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(h, attn, bias)
    for a, b in zip(gs, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_halo_scanned_matches_single_device_fwd_and_grad():
    """scan_segments composed with the halo mesh (VERDICT r2 weak 4 / next
    2): per-shard segment stacks scanned inside shard_map must reproduce
    single-device numerics, forward and gradients."""
    from relgat_projector_tpu.data.blocked import ScannedBlockedGraph
    from relgat_projector_tpu.ops.relgat_ops import relgat_propagate
    from relgat_projector_tpu.parallel import make_mesh
    from relgat_projector_tpu.parallel.halo import (
        build_halo_graph,
        halo_propagate,
    )

    src, dst, et, h0, attn, bias = _case(n_pad=300, e=2200, seed=2)
    mesh = make_mesh(data=2, graph=4)
    hg = build_halo_graph(
        src, dst, et, 300, 4, blocked=True, block_nodes=64,
        chunk_edges=128, overlap=False, scan_segments=3,
    ).with_mesh(mesh)
    assert isinstance(hg.blocked, ScannedBlockedGraph)
    assert hg.blocked.num_shards == 3
    # Stacked [G, S, ...] leaves: shard axis leads.
    assert hg.blocked.by_dst.chunk_meta.shape[:2] == (4, 3)

    n_pad = hg.num_nodes
    rng = np.random.default_rng(1)
    h = jnp.asarray(
        rng.standard_normal((n_pad, h0.shape[1], h0.shape[2]))
        .astype(np.float32)
    )
    want = np.asarray(relgat_propagate(
        h, attn, bias, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
        num_nodes=n_pad,
    ))
    got = np.asarray(halo_propagate(h, attn, bias, hg, use_pallas=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss_sharded(h_, a_, b_):
        return jnp.sum(jnp.sin(
            halo_propagate(h_, a_, b_, hg, use_pallas=True)
        ))

    def loss_single(h_, a_, b_):
        return jnp.sum(jnp.sin(relgat_propagate(
            h_, a_, b_, jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(et), num_nodes=n_pad,
        )))

    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(h, attn, bias)
    g1 = jax.grad(loss_single, argnums=(0, 1, 2))(h, attn, bias)
    for a, b in zip(gs, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_halo_scanned_dropout_matches_unscanned_halo():
    """Scanned per-shard layouts hash the same per-shard canonical edge
    ids as the unsplit halo layout, so in-kernel dropout masks replay
    identically whether or not a shard scans its segments."""
    from relgat_projector_tpu.parallel import make_mesh
    from relgat_projector_tpu.parallel.halo import (
        build_halo_graph,
        halo_propagate,
    )

    src, dst, et, h0, attn, bias = _case(n_pad=300, e=2200, seed=7)
    mesh = make_mesh(data=1, graph=4)
    mk = lambda s: build_halo_graph(
        src, dst, et, 300, 4, blocked=True, block_nodes=64,
        chunk_edges=128, overlap=False, scan_segments=s,
    ).with_mesh(mesh)
    hg_plain, hg_scan = mk(0), mk(3)
    n_pad = hg_plain.num_nodes
    rng = np.random.default_rng(4)
    h = jnp.asarray(
        rng.standard_normal((n_pad, h0.shape[1], h0.shape[2]))
        .astype(np.float32)
    )
    kw = dict(
        use_pallas=True, attn_dropout_rate=0.3,
        dropout_rng=jax.random.PRNGKey(5),
    )
    want = np.asarray(halo_propagate(h, attn, bias, hg_plain, **kw))
    got = np.asarray(halo_propagate(h, attn, bias, hg_scan, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # Dropout actually drops.
    base = np.asarray(
        halo_propagate(h, attn, bias, hg_scan, use_pallas=True)
    )
    assert np.abs(base - got).max() > 1e-3


def test_halo_scanned_with_head_tp_matches_single_device():
    """The full composition: halo shards x head tensor-parallelism x
    per-shard segment scanning on a (graph=2, model=2) mesh must match
    single-device numerics, forward and gradients."""
    from relgat_projector_tpu.ops.relgat_ops import relgat_propagate
    from relgat_projector_tpu.parallel import make_mesh
    from relgat_projector_tpu.parallel.halo import (
        build_halo_graph,
        halo_propagate,
    )

    src, dst, et, h0, attn, bias = _case(n_pad=300, e=2200, heads=4, seed=6)
    mesh = make_mesh(data=1, graph=2, model=2)
    hg = build_halo_graph(
        src, dst, et, 300, 2, blocked=True, block_nodes=64,
        chunk_edges=128, overlap=False, scan_segments=2,
    ).with_mesh(mesh)
    n_pad = hg.num_nodes
    rng = np.random.default_rng(8)
    h = jnp.asarray(
        rng.standard_normal((n_pad, 4, h0.shape[2])).astype(np.float32)
    )
    want = np.asarray(relgat_propagate(
        h, attn, bias, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
        num_nodes=n_pad,
    ))
    got = np.asarray(halo_propagate(h, attn, bias, hg, use_pallas=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss_sh(h_, a_, b_):
        return jnp.sum(jnp.sin(
            halo_propagate(h_, a_, b_, hg, use_pallas=True)
        ))

    def loss_1(h_, a_, b_):
        return jnp.sum(jnp.sin(relgat_propagate(
            h_, a_, b_, jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(et), num_nodes=n_pad,
        )))

    gs = jax.grad(loss_sh, argnums=(0, 1, 2))(h, attn, bias)
    g1 = jax.grad(loss_1, argnums=(0, 1, 2))(h, attn, bias)
    for a, b in zip(gs, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_trainer_halo_with_scan_segments_matches_single_device():
    """Full trainer: halo mesh + use_pallas + scan_segments (the r2 gate
    `graph_axis == 1` is gone) == single-device numerics; overlap is
    auto-disabled when scanning."""
    from relgat_projector_tpu.config import (
        MeshConfig, ModelConfig, RunConfig, TrainConfig,
    )
    from relgat_projector_tpu.data.blocked import ScannedBlockedGraph
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.parallel.halo import HaloGraph
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=160, num_edges=1600, num_rel=4, emb_dim=16, seed=0
    )

    def build(mesh_cfg, scan_segments):
        run = RunConfig(
            model=ModelConfig(
                in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
                gat_num_layers=2, dropout=0.0, project_to_input_size=True,
                projection_layers=1, use_pallas=True,
                mesh_propagate="halo", scan_segments=scan_segments,
            ),
            train=TrainConfig(
                epochs=1, train_batch_size=64, eval_batch_size=64,
                num_neg=4, lr=1e-3, lr_scheduler="constant",
                warmup_steps=0, eval_ks_ranks=(1, 2), seed=3,
                log_every_n_steps=10_000,
                out_dir="/tmp/relgat-halo-scan-test",
            ),
            mesh=mesh_cfg,
        )
        return RelGATTrainer(
            run, node2emb, rel2idx, triplets, log_to_console=False
        )

    t1 = build(MeshConfig(data_axis=1, graph_axis=1), 0)
    t2 = build(MeshConfig(data_axis=2, graph_axis=4), 4)
    assert isinstance(t2.graph.blocked, HaloGraph)
    assert isinstance(t2.graph.blocked.blocked, ScannedBlockedGraph)
    assert not t2.graph.blocked.overlap  # auto-disabled under scanning

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


def test_trainer_with_scan_segments():
    from relgat_projector_tpu.config import ModelConfig, RunConfig, TrainConfig
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.data.blocked import ScannedBlockedGraph
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=200, num_edges=2000, num_rel=4, emb_dim=16, seed=0
    )

    def build(scan_segments):
        run = RunConfig(
            model=ModelConfig(
                in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
                gat_num_layers=2, dropout=0.0, project_to_input_size=True,
                projection_layers=1, use_pallas=True,
                scan_segments=scan_segments,
            ),
            train=TrainConfig(
                epochs=1, train_batch_size=64, eval_batch_size=64,
                num_neg=4, lr=1e-3, lr_scheduler="constant",
                warmup_steps=0, eval_ks_ranks=(1, 2), seed=3,
                log_every_n_steps=10_000,
                out_dir="/tmp/relgat-scan-seg-test",
            ),
        )
        return RelGATTrainer(
            run, node2emb, rel2idx, triplets, log_to_console=False
        )

    t1 = build(0)
    t2 = build(4)
    assert isinstance(t2.graph.blocked, ScannedBlockedGraph)
    assert t2.graph.blocked.num_shards == 4

    t1._single_epoch(1, 1)
    t2._single_epoch(1, 1)
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
        )
