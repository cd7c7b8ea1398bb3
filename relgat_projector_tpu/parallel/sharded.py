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
from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from relgat_projector_tpu.data.graph import GraphData
from relgat_projector_tpu.parallel.mesh import DATA_AXIS, GRAPH_AXIS


def put_global(mesh: Mesh, arr: Any, spec: P) -> jax.Array:
    """Place one array with ``spec`` — multi-process safe.

    Single-process: plain ``device_put``. Multi-process (``jax.distributed``
    initialized, mesh spanning several hosts): ``device_put`` would commit a
    process-local array and cannot express shards owned by other processes,
    so the global array is assembled from per-shard callbacks instead —
    each process materializes exactly its addressable shards
    (``jax.make_array_from_callback``), never shipping or validating
    non-addressable data. The host value must be identical on every process
    (all our placements are: params/batches are seed-deterministic, graph
    layouts are host-built deterministically).
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, NamedSharding(mesh, spec))
    host = np.asarray(arr)
    return jax.make_array_from_callback(
        host.shape, NamedSharding(mesh, spec), lambda idx: host[idx]
    )


def make_global_from_row_loader(
    mesh: Mesh,
    shape,
    dtype,
    spec: P,
    row_loader: Callable[[int, int], np.ndarray],
) -> jax.Array:
    """Build a global ``[N, ...]`` array sharded on axis 0 WITHOUT the host
    ever materializing the full matrix: ``row_loader(lo, hi)`` is invoked
    only for the row ranges of this process's addressable shards (the
    multi-host node-feature path — SURVEY §5.8)."""
    sharding = NamedSharding(mesh, spec)
    cache = {}

    def cb(idx):
        r = idx[0]
        lo = 0 if r.start is None else int(r.start)
        hi = shape[0] if r.stop is None else int(r.stop)
        key = (lo, hi)
        if key not in cache:
            cache[key] = np.asarray(
                row_loader(lo, hi), dtype=dtype
            )[(slice(None),) + idx[1:]]
        return cache[key]

    return jax.make_array_from_callback(tuple(shape), sharding, cb)


def place_replicated(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params, opt state, frozen embeddings)."""
    return jax.tree_util.tree_map(
        lambda x: put_global(mesh, x, P()), tree
    )


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

    return dataclasses.replace(
        graph,
        src=put_global(mesh, graph.src, P(GRAPH_AXIS)),
        dst=put_global(mesh, graph.dst, P(GRAPH_AXIS)),
        etype=put_global(mesh, graph.etype, P(GRAPH_AXIS)),
        blocked=blocked,
    )


def place_node_features(mesh: Mesh, arr: jax.Array) -> jax.Array:
    """Shard a ``[N, ...]`` node-feature matrix over the ``graph`` axis
    (halo mode: features live node-sharded end-to-end)."""
    return put_global(mesh, arr, P(GRAPH_AXIS))


def place_batch(mesh: Mesh, *arrays):
    """Shard per-example batch arrays over the ``data`` axis."""
    out = tuple(put_global(mesh, a, P(DATA_AXIS)) for a in arrays)
    return out if len(out) > 1 else out[0]


def place_scan_batch(mesh: Mesh, *arrays):
    """Shard stacked ``[S, B]`` scan batches over the ``data`` axis on the
    BATCH dimension (axis 1) — axis 0 is the lax.scan step axis and must
    stay unsharded (sharding it would both require S % data == 0 and defeat
    per-step data parallelism)."""
    out = tuple(put_global(mesh, a, P(None, DATA_AXIS)) for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_batch_arrays(mesh: Mesh, src, rel, dst, weight):
    return place_batch(mesh, src, rel, dst, weight)
