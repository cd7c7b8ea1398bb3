"""Static-shape graph container and construction utilities.

The reference keeps the message-passing graph as raw COO tensors built from
train edges only (``dataset/relgat_dataset.py:123-137``). On TPU everything
must be static-shape and layout-friendly:

- edges are **sorted by destination** so segment reductions run over sorted
  segments (and the Pallas kernels can stream contiguous dst runs),
- edge and node counts are **padded to tile multiples**; padded edges point
  their ``dst`` (and ``src``) at a padded node row so they are unobservable
  in softmax denominators and aggregation sums,
- the container is a registered dataclass whose counts are static metadata,
  so it passes through ``jax.jit`` without retracing on content changes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp


def round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphData:
    """COO knowledge graph, dst-sorted and padded to static shapes."""

    src: jax.Array    # [E_pad] int32 source node ids
    dst: jax.Array    # [E_pad] int32 destination node ids (non-decreasing)
    etype: jax.Array  # [E_pad] int32 relation ids
    # Static metadata (not traced):
    num_nodes: int = dataclasses.field(metadata={"static": True})
    num_real_nodes: int = dataclasses.field(metadata={"static": True})
    num_real_edges: int = dataclasses.field(metadata={"static": True})
    sorted_by_dst: bool = dataclasses.field(
        default=True, metadata={"static": True}
    )
    # Optional block-padded layout for the Pallas kernel path
    # (``data/blocked.py``); None on the plain XLA path.
    blocked: object = None

    @property
    def num_edges_padded(self) -> int:
        return int(self.src.shape[0])


def build_graph(
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    num_nodes: int,
    *,
    edge_pad_multiple: int = 128,
    node_pad_multiple: int = 8,
    sort_by_dst: bool = True,
    blocked: bool = False,
    block_nodes: int = 128,
    chunk_edges: int = 256,
    graph_shards: int = 1,
    halo_shards: int = 0,
    halo_overlap: bool = False,
    scan_segments: int = 0,
) -> GraphData:
    """Build a padded, dst-sorted :class:`GraphData` from host COO arrays.

    Padded edges use ``src = dst = num_nodes_padded - 1`` (a padded node row)
    and ``etype = 0``; padded nodes have zero in-degree from real edges, so
    nothing real is perturbed.

    ``halo_shards > 0`` builds the boundary-only halo-exchange layout
    (``parallel/halo.py``) — node-sharded features over that many graph-axis
    devices; ``graph_shards > 1`` (with ``blocked``) builds per-device
    blocked layouts for the replicated-feature Pallas mesh path instead.
    """
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    etype = np.asarray(etype, dtype=np.int32)
    num_real_edges = int(src.shape[0])
    num_real_nodes = int(num_nodes)

    if sort_by_dst and num_real_edges > 0:
        order = np.argsort(dst, kind="stable")
        src, dst, etype = src[order], dst[order], etype[order]

    halo_graph = None
    if halo_shards > 0:
        from relgat_projector_tpu.parallel.halo import build_halo_graph

        halo_graph = build_halo_graph(
            src[:num_real_edges],
            dst[:num_real_edges],
            etype[:num_real_edges],
            num_real_nodes=num_real_nodes,
            num_shards=halo_shards,
            blocked=blocked,
            block_nodes=block_nodes,
            chunk_edges=chunk_edges,
            # Per-shard segment scanning composes with the halo layout but
            # not with the overlap split (no partial-merge form of the
            # scanned VJP) — callers pass halo_overlap=False when scanning.
            overlap=halo_overlap,
            scan_segments=scan_segments if blocked else 0,
        )

    # Always reserve at least one padded node row to absorb padded edges.
    # Halo mode pads to the shard-even node space instead.
    num_nodes_padded = (
        halo_graph.num_nodes
        if halo_graph is not None
        else round_up(num_real_nodes + 1, node_pad_multiple)
    )
    e_pad = max(round_up(max(num_real_edges, 1), edge_pad_multiple), edge_pad_multiple)

    pad_n = e_pad - num_real_edges
    pad_node = num_nodes_padded - 1
    src_p = np.concatenate([src, np.full(pad_n, pad_node, np.int32)])
    dst_p = np.concatenate([dst, np.full(pad_n, pad_node, np.int32)])
    et_p = np.concatenate([etype, np.zeros(pad_n, np.int32)])

    blocked_graph = None
    if halo_graph is not None:
        blocked_graph = halo_graph
    elif blocked and scan_segments > 1:
        # Segment stacks for the memory-bounded scanned propagate
        # (``ops/pallas/kernels.py``): dst-partitioned forward segments,
        # src-partitioned backward segments.
        from relgat_projector_tpu.data.blocked import build_scanned_graph

        blocked_graph = build_scanned_graph(
            src[:num_real_edges],
            dst[:num_real_edges],
            etype[:num_real_edges],
            num_nodes=num_nodes_padded,
            num_segments=scan_segments,
            block_nodes=block_nodes,
            chunk_edges=chunk_edges,
        )
    elif blocked:
        # Only REAL edges; the blocked layouts make their own masked padding.
        real = (
            src[:num_real_edges],
            dst[:num_real_edges],
            etype[:num_real_edges],
        )
        if graph_shards > 1:
            # Per-device layouts for the fused kernels under the mesh
            # (``parallel/pallas_sharded.py``); the trainer attaches the
            # mesh and placements after construction.
            from relgat_projector_tpu.parallel.pallas_sharded import (
                shard_blocked_graph,
            )

            blocked_graph = shard_blocked_graph(
                *real,
                num_nodes=num_nodes_padded,
                num_shards=graph_shards,
                block_nodes=block_nodes,
                chunk_edges=chunk_edges,
            )
        else:
            from relgat_projector_tpu.data.blocked import build_blocked_graph

            blocked_graph = build_blocked_graph(
                *real,
                num_nodes=num_nodes_padded,
                block_nodes=block_nodes,
                chunk_edges=chunk_edges,
            )

    return GraphData(
        src=jnp.asarray(src_p),
        dst=jnp.asarray(dst_p),
        etype=jnp.asarray(et_p),
        num_nodes=num_nodes_padded,
        num_real_nodes=num_real_nodes,
        num_real_edges=num_real_edges,
        sorted_by_dst=sort_by_dst,
        blocked=blocked_graph,
    )


def pad_node_embeddings(
    emb: np.ndarray, num_nodes_padded: int
) -> np.ndarray:
    """Zero-pad the frozen ``[N, D]`` embedding matrix to the padded node count."""
    n, d = emb.shape
    if num_nodes_padded < n:
        raise ValueError("padded node count smaller than real node count")
    out = np.zeros((num_nodes_padded, d), dtype=emb.dtype)
    out[:n] = emb
    return out


def split_edges(
    edges: np.ndarray,
    train_ratio: float,
    seed: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Seeded shuffle + ratio split (semantics of ``relgat_dataset.py:70-88``:
    shuffle all edges, first ``ratio`` fraction is train). ``edges`` is
    ``[E, 3]`` (src, dst, rel)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(edges.shape[0])
    shuffled = edges[perm]
    n_train = int(train_ratio * edges.shape[0])
    return shuffled[:n_train], shuffled[n_train:]


def compact_node_ids(node_ids: np.ndarray) -> Tuple[np.ndarray, dict]:
    """Sorted-id compaction (``relgat_dataset.py:61-63``): returns the sorted
    unique id array and an ``id -> index`` mapping."""
    sorted_ids = np.sort(np.unique(np.asarray(node_ids)))
    return sorted_ids, {int(v): i for i, v in enumerate(sorted_ids)}
