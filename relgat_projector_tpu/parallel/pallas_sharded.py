"""Fused Pallas RelGAT kernels under the multi-chip mesh.

Round-1 left the perf path (fused Pallas kernels, single chip) and the scale
path (GSPMD mesh, XLA segment ops) mutually exclusive. This module composes
them: destination nodes are partitioned into contiguous ranges, one per
device on the ``graph`` mesh axis; each device gets its OWN block-padded
layout (``data/blocked.py``) over the edges pointing into its range and runs
the unmodified fused kernels inside ``shard_map``:

- forward: dst ownership is exclusive, so per-device outputs concatenate
  (``out_specs P('graph')``) — no reduction collective at all,
- backward: each device's src-blocked kernel scatters its dh partial over
  the FULL source node space; ``shard_map``'s transpose of the replicated
  input spec (``P()``) inserts the psum across the ``graph`` axis.

The per-device computation is exactly the single-chip custom-VJP propagate
(``ops/pallas/kernels.py``); only the layouts differ — local by_dst layouts
index a rebased dst range while by_src layouts keep global source ids.

TPU-native scale-out per SURVEY.md §5.7/§7.2 step 7 (the reference has no
parallelism of any kind to translate — ``trainer/relgat_projector.py:261``
moves to one device).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from relgat_projector_tpu.data.blocked import (
    BlockedGraph,
    build_blocked_shards,
)
from relgat_projector_tpu.data.graph import round_up
from relgat_projector_tpu.parallel.mesh import GRAPH_AXIS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedBlockedGraph:
    """Per-device block-padded layouts, stacked ``[G, ...]`` on every leaf.

    ``shards.by_dst`` indexes a LOCAL dst space of ``rows_per_shard`` rows
    (``BlockedGraph.num_nodes == rows_per_shard``); ``shards.by_src`` keeps
    global src ids (its blocks cover the full padded node space) with dst
    ids rebased to the local range (the backward gathers per-dst stats from
    the device's local output rows).
    """

    shards: BlockedGraph  # leaves stacked [G, ...]; statics per-shard
    num_shards: int = dataclasses.field(metadata={"static": True})
    rows_per_shard: int = dataclasses.field(metadata={"static": True})
    # Global padded node count — callers slice the concatenated
    # [G * rows_per_shard, ...] output back to this.
    num_nodes: int = dataclasses.field(metadata={"static": True})
    num_real_edges: int = dataclasses.field(metadata={"static": True})
    # The mesh is static trace-time metadata (hashable); attached by the
    # trainer via with_mesh() once the mesh exists.
    mesh: Optional[Mesh] = dataclasses.field(
        default=None, metadata={"static": True}
    )

    def with_mesh(self, mesh: Mesh) -> "ShardedBlockedGraph":
        return dataclasses.replace(self, mesh=mesh)


def shard_blocked_graph(
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    num_nodes: int,
    num_shards: int,
    *,
    block_nodes: int = 128,
    chunk_edges: int = 256,
) -> ShardedBlockedGraph:
    """Host-side build of per-device blocked layouts over contiguous dst
    ranges. ``num_nodes`` is the padded global node count; only REAL edges
    go in (each per-shard layout makes its own masked padding)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    etype = np.asarray(etype, np.int64)

    # Whole dst blocks per shard; global src (gather) space. The 4th
    # element gives each edge its GLOBAL position as the canonical dropout
    # id, so per-shard in-kernel masks are bitwise the single-device masks
    # for the same key (the input here is the same dst-sorted edge array
    # build_blocked_graph consumes on one device).
    rows = round_up(-(-num_nodes // num_shards), block_nodes)
    shard_of = np.minimum(dst // rows, num_shards - 1)
    per_shard = []
    for g in range(num_shards):
        sel = shard_of == g
        per_shard.append(
            (src[sel], dst[sel] - g * rows, etype[sel], np.nonzero(sel)[0])
        )

    stacked = build_blocked_shards(
        per_shard, rows, num_nodes,
        block_nodes=block_nodes, chunk_edges=chunk_edges,
    )
    return ShardedBlockedGraph(
        shards=stacked,
        num_shards=num_shards,
        rows_per_shard=rows,
        num_nodes=int(num_nodes),
        num_real_edges=int(src.shape[0]),
    )


def place_sharded_blocked(
    mesh: Mesh, sbg: ShardedBlockedGraph
) -> ShardedBlockedGraph:
    """Put each shard's layout arrays on its ``graph``-axis device row
    (replicated across ``data``)."""
    sharding = NamedSharding(mesh, P(GRAPH_AXIS))
    shards = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), sbg.shards
    )
    return dataclasses.replace(sbg, shards=shards, mesh=mesh)


def pallas_sharded_propagate(
    h: jax.Array,              # [N_pad, H, F] node features (replicated)
    attn_bank: jax.Array,      # [H, R, F]
    rel_bias: Optional[jax.Array],
    sbg: ShardedBlockedGraph,
    *,
    negative_slope: float = 0.2,
    eps: float = 1e-16,
    attn_dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    kernel_precision: str = "highest",
) -> jax.Array:
    """Fused-kernel propagate over the graph-sharded mesh; returns the
    ``[N_pad, H, F]`` aggregate (sliced from the concatenated per-device
    ranges)."""
    from relgat_projector_tpu.ops.pallas.kernels import (
        relgat_propagate_pallas,
    )

    if sbg.mesh is None:
        raise ValueError(
            "ShardedBlockedGraph has no mesh attached; call with_mesh()/"
            "place_sharded_blocked() first"
        )
    mesh = sbg.mesh
    use_bias = rel_bias is not None
    num_rel = attn_bank.shape[1]
    bias_arg = (
        rel_bias if use_bias else jnp.zeros((num_rel,), jnp.float32)
    )
    use_dropout = attn_dropout_rate > 0.0 and dropout_rng is not None
    rng_arg = dropout_rng if use_dropout else jax.random.PRNGKey(0)

    def local_fn(h_full, attn, bias, rng, shards):
        local = jax.tree_util.tree_map(lambda x: x[0], shards)
        local_rng = None
        if use_dropout:
            # SAME seed on every shard: canonical edge ids in the layouts
            # are global positions in the dst-sorted edge array, so the
            # (seed, edge id, head) hash reproduces the single-device masks
            # bitwise — dropout parity holds across device counts.
            local_rng = rng
        return relgat_propagate_pallas(
            h_full,
            attn,
            bias if use_bias else None,
            local,
            negative_slope=negative_slope,
            eps=eps,
            attn_dropout_rate=attn_dropout_rate if use_dropout else 0.0,
            dropout_rng=local_rng,
            kernel_precision=kernel_precision,
        )  # [rows_per_shard, H, F]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(GRAPH_AXIS)),
        out_specs=P(GRAPH_AXIS),
        check_vma=False,
    )
    out = fn(h, attn_bank, bias_arg, rng_arg, sbg.shards)
    return out[: sbg.num_nodes]
