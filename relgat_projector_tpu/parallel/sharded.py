"""Sharding placement for multi-chip training (GSPMD path).

Idiomatic JAX scaling: annotate the DATA with shardings and let the jitted
train step follow placement — GSPMD partitions the computation and inserts
the collectives (partial segment-reductions over edge shards + all-reduce of
the ``[N, ...]`` aggregates across the ``graph`` axis; gradient all-reduce
across both axes). No NCCL/MPI translation — there is nothing to translate,
the reference is single-device (SURVEY.md §2.3, §5.8).

Placement map:
- edge arrays ``src/dst/etype [E_pad]``  -> ``P('graph')`` (edge partition)
- batch arrays ``[B]``                   -> ``P('data')``  (DP)
- params / optimizer state / node_emb    -> ``P()``        (replicated)

An explicit ``shard_map`` halo-exchange path (dst-block-partitioned edges +
boundary feature all-to-all overlapped with local aggregation) is the
planned perf path for pod-scale graphs (SURVEY.md §5.7).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from relgat_projector_tpu.data.graph import GraphData
from relgat_projector_tpu.parallel.mesh import DATA_AXIS, GRAPH_AXIS


def place_replicated(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params, opt state, frozen embeddings)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def place_graph(mesh: Mesh, graph: GraphData) -> GraphData:
    """Shard the edge lists over the ``graph`` mesh axis.

    The dst-sorted layout means each shard holds a contiguous dst range —
    exactly the partition the halo-exchange / per-device-Pallas paths use.
    A sharded blocked layout (``parallel/pallas_sharded.py``) gets its mesh
    attached and its per-shard leaves placed on their devices."""
    from relgat_projector_tpu.parallel.halo import (
        HaloGraph,
        place_halo_graph,
    )
    from relgat_projector_tpu.parallel.pallas_sharded import (
        ShardedBlockedGraph,
        place_sharded_blocked,
    )

    from relgat_projector_tpu.data.blocked import ScannedBlockedGraph

    blocked = graph.blocked
    if isinstance(blocked, ShardedBlockedGraph):
        blocked = place_sharded_blocked(mesh, blocked)
    elif isinstance(blocked, ScannedBlockedGraph):
        # Segment stacks (scan_segments) under a DP-only mesh: replicate.
        blocked = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), blocked
        )
    elif isinstance(blocked, HaloGraph):
        blocked = place_halo_graph(mesh, blocked)

    edge_sharding = NamedSharding(mesh, P(GRAPH_AXIS))
    return dataclasses.replace(
        graph,
        src=jax.device_put(graph.src, edge_sharding),
        dst=jax.device_put(graph.dst, edge_sharding),
        etype=jax.device_put(graph.etype, edge_sharding),
        blocked=blocked,
    )


def place_node_features(mesh: Mesh, arr: jax.Array) -> jax.Array:
    """Shard a ``[N, ...]`` node-feature matrix over the ``graph`` axis
    (halo mode: features live node-sharded end-to-end)."""
    return jax.device_put(arr, NamedSharding(mesh, P(GRAPH_AXIS)))


def place_batch(mesh: Mesh, *arrays: jax.Array):
    """Shard per-example batch arrays over the ``data`` axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def place_scan_batch(mesh: Mesh, *arrays: jax.Array):
    """Shard stacked ``[S, B]`` scan batches over the ``data`` axis on the
    BATCH dimension (axis 1) — axis 0 is the lax.scan step axis and must
    stay unsharded (sharding it would both require S % data == 0 and defeat
    per-step data parallelism)."""
    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_batch_arrays(mesh: Mesh, src, rel, dst, weight):
    return place_batch(mesh, src, rel, dst, weight)
