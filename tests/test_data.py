"""Data pipeline: compaction, split, graph build, padding, batching."""

import numpy as np
import jax.numpy as jnp

from relgat_projector_tpu.data import (
    RelGATData,
    build_graph,
    generate_synthetic_kg,
)
from relgat_projector_tpu.ops import segment_sum


def _tiny_kg(n=50, e=200, r=4, d=8, seed=0):
    return generate_synthetic_kg(
        num_nodes=n, num_edges=e, num_rel=r, emb_dim=d, seed=seed,
        structured=False,
    )


def test_build_graph_sorted_and_padded():
    rng = np.random.default_rng(0)
    src, dst, et = rng.integers(0, 30, 100), rng.integers(0, 30, 100), rng.integers(0, 3, 100)
    g = build_graph(src, dst, et, num_nodes=30)
    assert g.num_edges_padded % 128 == 0
    assert g.num_nodes % 8 == 0 and g.num_nodes > 30
    d = np.asarray(g.dst)
    assert (np.diff(d) >= 0).all()  # dst-sorted incl. padded tail
    # padded edges all point at the last (padded) node row
    assert (d[g.num_real_edges:] == g.num_nodes - 1).all()
    # content preserved as a multiset of triplets
    got = set(zip(np.asarray(g.src)[:100], d[:100], np.asarray(g.etype)[:100]))
    want = set(zip(src, dst, et))
    assert got == want


def test_padded_edges_do_not_touch_real_nodes():
    rng = np.random.default_rng(1)
    g = build_graph(
        rng.integers(0, 20, 10), rng.integers(0, 20, 10), rng.integers(0, 2, 10),
        num_nodes=20,
    )
    ones = jnp.ones((g.num_edges_padded,))
    deg = np.asarray(segment_sum(ones, g.dst, g.num_nodes))
    # real nodes only receive real edges
    assert deg[:20].sum() == 10


def test_relgat_data_split_and_graph():
    node2emb, rel2idx, triplets = _tiny_kg()
    data = RelGATData(node2emb, rel2idx, triplets, train_ratio=0.8, seed=7)
    assert data.num_train == 160 and data.num_eval == 40
    assert data.num_rel == 4
    # graph built from train edges only
    assert data.graph.num_real_edges == 160
    assert data.node_emb.shape == (data.graph.num_nodes, 8)
    # padded embedding rows are zero
    assert (data.node_emb[50:] == 0).all()


def test_split_is_seed_deterministic():
    node2emb, rel2idx, triplets = _tiny_kg(seed=2)
    d1 = RelGATData(node2emb, rel2idx, triplets, seed=3)
    d2 = RelGATData(node2emb, rel2idx, triplets, seed=3)
    np.testing.assert_array_equal(d1.train_edges, d2.train_edges)
    d3 = RelGATData(node2emb, rel2idx, triplets, seed=4)
    assert not np.array_equal(d1.train_edges, d3.train_edges)


def test_batching_static_shapes_and_mask():
    node2emb, rel2idx, triplets = _tiny_kg()
    data = RelGATData(node2emb, rel2idx, triplets, train_ratio=0.8, seed=0)
    batches = list(data.train_batches(batch_size=48))
    assert len(batches) == data.steps_per_epoch(48) == 4  # ceil(160/48)
    for b in batches:
        assert b.src.shape == (48,) and b.weight.shape == (48,)
    # last batch: 160 - 3*48 = 16 valid examples
    assert batches[-1].weight.sum() == 16
    # every train edge appears exactly once per epoch
    seen = np.concatenate(
        [np.stack([b.src, b.dst, b.rel], 1)[b.weight > 0] for b in batches]
    )
    want = np.stack(
        [data.train_edges[:, 0], data.train_edges[:, 1], data.train_edges[:, 2]], 1
    )
    assert (
        sorted(map(tuple, seen.tolist())) == sorted(map(tuple, want.tolist()))
    )


def test_synthetic_kg_format():
    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=100, num_edges=500, num_rel=3, emb_dim=16, seed=0
    )
    assert len(node2emb) == 100 and len(rel2idx) == 3 and len(triplets) == 500
    s, d, r = triplets[0]
    assert isinstance(r, str) and r in rel2idx
    assert 0 <= s < 100 and 0 <= d < 100
