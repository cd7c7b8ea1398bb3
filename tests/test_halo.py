"""shard_map edge-partitioned propagate: parity with single-device and
differentiability on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from relgat_projector_tpu.ops.relgat_ops import relgat_propagate
from relgat_projector_tpu.parallel import make_mesh
from relgat_projector_tpu.parallel.halo import (
    edge_partitioned_propagate,
    partition_graph_by_dst,
)


def _case(n=100, e=600, r=5, heads=3, f=16, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = rng.integers(0, r, e).astype(np.int32)
    h = jnp.asarray(rng.standard_normal((n, heads, f)).astype(np.float32))
    attn = jnp.asarray(
        (rng.standard_normal((heads, r, f)) * 0.3).astype(np.float32)
    )
    bias = jnp.asarray((rng.standard_normal(r) * 0.1).astype(np.float32))
    return src, dst, et, h, attn, bias, n


def test_partition_covers_all_edges():
    src, dst, et, h, attn, bias, n = _case()
    pg = partition_graph_by_dst(src, dst, et, n, num_shards=4)
    assert pg.src.shape[0] == 4
    m = np.asarray(pg.mask)
    assert m.sum() == 600
    # reconstruct global triplets
    rows = pg.rows_per_shard
    got = []
    for g in range(4):
        sel = m[g] > 0
        got += list(zip(
            np.asarray(pg.src)[g][sel],
            np.asarray(pg.dst_local)[g][sel] + g * rows,
            np.asarray(pg.etype)[g][sel],
        ))
    assert sorted(got) == sorted(zip(src, dst, et))


def test_edge_partitioned_matches_single_device():
    src, dst, et, h, attn, bias, n = _case()
    want = np.asarray(relgat_propagate(
        h, attn, bias, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
        num_nodes=n,
    ))

    mesh = make_mesh(data=2, graph=4)
    pg = partition_graph_by_dst(src, dst, et, n, num_shards=4)
    got = np.asarray(
        edge_partitioned_propagate(mesh, h, attn, bias, pg)
    )[:n]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # no-bias variant
    want2 = np.asarray(relgat_propagate(
        h, attn, None, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
        num_nodes=n,
    ))
    got2 = np.asarray(
        edge_partitioned_propagate(mesh, h, attn, None, pg)
    )[:n]
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-5)


def test_edge_partitioned_gradients():
    src, dst, et, h, attn, bias, n = _case(seed=3)
    mesh = make_mesh(data=1, graph=8)
    pg = partition_graph_by_dst(src, dst, et, n, num_shards=8)

    def loss_sharded(h_, a_, b_):
        out = edge_partitioned_propagate(mesh, h_, a_, b_, pg)[:n]
        return jnp.sum(jnp.sin(out))

    def loss_single(h_, a_, b_):
        out = relgat_propagate(
            h_, a_, b_, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
            num_nodes=n,
        )
        return jnp.sum(jnp.sin(out))

    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(h, attn, bias)
    g1 = jax.grad(loss_single, argnums=(0, 1, 2))(h, attn, bias)
    for a, b in zip(gs, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )
