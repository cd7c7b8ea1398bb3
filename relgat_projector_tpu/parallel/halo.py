"""Explicit edge-partitioned message passing with ``shard_map``.

The graph analog of sequence/context parallelism (SURVEY.md §5.7): partition
destination nodes into contiguous ranges, one per device on the ``graph``
mesh axis; each device owns the edges pointing into its range (dst-sorted
edges shard contiguously) and produces exactly its slice of the output.

Communication pattern (explicit, vs. the GSPMD path in ``sharded.py`` that
lets XLA insert psums of full ``[N, ...]`` partials):

- node features are replicated going in (frozen embeddings / previous-layer
  activations) — the "halo" each device needs is the source set of its own
  edges, which for arbitrary KGs is unbounded, so v1 exchanges the full
  feature matrix once per layer (``all_gather`` when the input arrives
  sharded); a boundary-only all-to-all is the planned refinement for
  partitioned/clustered graphs,
- each device runs the SAME single-device propagate (XLA or Pallas path) on
  its local edge shard with dst indices rebased to its range,
- outputs need NO reduction: destination ownership is exclusive, so the
  result is simply the concatenation of per-device slices
  (``out_specs P('graph')``) — this is the scaling win over psum.

Differentiable end-to-end (``shard_map`` transposes collectives).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from relgat_projector_tpu.parallel.mesh import GRAPH_AXIS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Edge shards by contiguous destination ranges, padded to equal size.

    Leading axis = shard; padded edges point src/dst at the shard's last
    padded row... they carry ``mask = 0`` and are excluded via the masked
    softmax, so they contribute exactly zero.
    """

    src: jax.Array        # [G, E_sh] int32 (global node ids)
    dst_local: jax.Array  # [G, E_sh] int32 (dst - shard_lo, in [0, rows))
    etype: jax.Array      # [G, E_sh] int32
    mask: jax.Array       # [G, E_sh] float32
    num_shards: int = dataclasses.field(metadata={"static": True})
    rows_per_shard: int = dataclasses.field(metadata={"static": True})
    num_nodes: int = dataclasses.field(metadata={"static": True})
    num_real_edges: int = dataclasses.field(metadata={"static": True})


def partition_graph_by_dst(
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    num_nodes: int,
    num_shards: int,
    *,
    pad_multiple: int = 8,
) -> PartitionedGraph:
    """Build equal-size dst-range edge shards (host-side)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    etype = np.asarray(etype, np.int64)
    e = src.shape[0]

    rows = -(-num_nodes // num_shards)
    rows = -(-rows // pad_multiple) * pad_multiple
    shard_of = np.minimum(dst // rows, num_shards - 1)
    counts = np.bincount(shard_of, minlength=num_shards)
    e_sh = max(pad_multiple, int(-(-counts.max() // pad_multiple) * pad_multiple)) if e else pad_multiple

    src_s = np.zeros((num_shards, e_sh), np.int32)
    dstl_s = np.zeros((num_shards, e_sh), np.int32)
    et_s = np.zeros((num_shards, e_sh), np.int32)
    mask_s = np.zeros((num_shards, e_sh), np.float32)
    for g in range(num_shards):
        sel = shard_of == g
        n = int(sel.sum())
        src_s[g, :n] = src[sel]
        dstl_s[g, :n] = dst[sel] - g * rows
        et_s[g, :n] = etype[sel]
        mask_s[g, :n] = 1.0

    return PartitionedGraph(
        src=jnp.asarray(src_s),
        dst_local=jnp.asarray(dstl_s),
        etype=jnp.asarray(et_s),
        mask=jnp.asarray(mask_s),
        num_shards=num_shards,
        rows_per_shard=rows,
        num_nodes=int(num_nodes),
        num_real_edges=int(e),
    )


def edge_partitioned_propagate(
    mesh: Mesh,
    h: jax.Array,              # [N_any, H, F] node features (replicated)
    attn_bank: jax.Array,      # [H, R, F]
    rel_bias: Optional[jax.Array],
    pg: PartitionedGraph,
    *,
    negative_slope: float = 0.2,
    eps: float = 1e-16,
) -> jax.Array:
    """Returns ``[num_shards * rows_per_shard, H, F]`` aggregated messages
    (node-sharded over the ``graph`` axis; slice ``[:N]`` for real rows).
    """
    from relgat_projector_tpu.ops.relgat_ops import relgat_propagate

    rows = pg.rows_per_shard
    use_bias = rel_bias is not None

    def local_fn(h_full, src, dstl, et, mask, bias):
        # Shapes inside: src/dstl/et/mask are [1, E_sh] (one shard).
        out = relgat_propagate(
            h_full,
            attn_bank,
            bias if use_bias else None,
            src[0],
            dstl[0],
            et[0],
            num_nodes=rows,
            negative_slope=negative_slope,
            eps=eps,
            edge_mask=mask[0],
        )
        return out  # [rows, H, F]

    bias_arg = rel_bias if use_bias else jnp.zeros((attn_bank.shape[1],))
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
                  P(GRAPH_AXIS), P()),
        out_specs=P(GRAPH_AXIS),
        check_vma=False,
    )
    return fn(h, pg.src, pg.dst_local, pg.etype, pg.mask, bias_arg)
