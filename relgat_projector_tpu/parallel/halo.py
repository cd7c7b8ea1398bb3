"""Boundary-only halo exchange: node-sharded message passing over the mesh.

The graph analog of sequence/context parallelism (SURVEY.md §5.7): node
features live SHARDED over the ``graph`` mesh axis end-to-end. Each device
owns a contiguous range of ``rows_per_shard`` destination rows and the edges
pointing into them. Per layer:

1. every device gathers the rows its peers need from its OWN shard
   (host-precomputed static ``send_idx``) and one ``all_to_all`` over ICI
   delivers each device exactly its boundary (halo) source set — NOT the
   full feature matrix (round-1's v1 replicated ``[N, H, F]`` per layer;
   this exchanges ``G * halo_pair`` rows, which for partitioned/clustered
   graphs is the boundary size, not N),
2. each device runs the unmodified single-device propagate — the XLA
   segment ops or the fused Pallas kernels (``ops/pallas``) — with edge
   source ids rebased into the received halo buffer,
3. destination ownership is exclusive, so outputs concatenate
   (``out_specs P('graph')``): no reduction collective.

Differentiable end-to-end: the halo gather + ``all_to_all`` are plain JAX
ops, so AD transposes them into the reverse exchange + scatter-add of the
boundary cotangents automatically (again boundary-sized, not N-sized).

The reference has no distributed code of any kind to translate
(``trainer/relgat_projector.py:261`` is a single ``.to(device)``); this
subsystem is the TPU-native scale-out design mandated by SURVEY.md
§2.3/§5.7/§5.8.

Comm/compute overlap (``overlap=True``, the trainer default): each shard's
edges are pre-split into LOCAL-source edges (aggregated straight from the
shard's own rows, no dependence on the exchange) and REMOTE-source edges
(aggregated from the received halo buffer); the two partial aggregations
carry online-softmax state and merge flash-style
(``_halo_propagate_overlapped``), so the boundary ``all_to_all`` can run
concurrently with the local subset's SDDMM/segment work instead of
serializing exchange -> aggregate. Numerics (incl. dropout masks) are
identical to the unsplit path — tests/test_halo.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from relgat_projector_tpu.parallel.mesh import GRAPH_AXIS, MODEL_AXIS


from relgat_projector_tpu.data.graph import round_up as _round_up


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloGraph:
    """Static halo-exchange plan + per-device edge layouts (leaves stacked
    ``[G, ...]``; placed with ``P('graph')`` on the leading axis).

    ``send_idx[o, d, :]`` are owner ``o``'s local row ids to ship to dest
    ``d`` (the diagonal ``o == d`` is unused — own rows are read directly).
    The received buffer on ``d`` is ``[G, halo_pair, H*F]``; edge sources
    index the concatenation ``[own rows (rows_per_shard) ++ halo buffer
    (G * halo_pair)]``: ``src_halo < rows_per_shard`` hits local features,
    otherwise ``rows_per_shard + o * halo_pair + slot``.
    """

    send_idx: jax.Array    # [G, G, Hp] int32
    # Unsplit per-shard edge arrays — None in overlap mode (the overlapped
    # propagate reads only the local/remote splits below).
    src_halo: Optional[jax.Array]   # [G, E_sh] int32 (halo-space src ids)
    dst_local: Optional[jax.Array]  # [G, E_sh] int32 (dst - g*rows, sorted)
    etype: Optional[jax.Array]      # [G, E_sh] int32
    mask: Optional[jax.Array]       # [G, E_sh] float32 (1 = real edge)
    # Optional per-device block-padded layouts for the fused Pallas kernels
    # (by_dst over the local dst range, by_src over the HALO space).
    blocked: object = None
    # --- comm/compute-overlap split (built with ``overlap=True``) -------
    # Each shard's edges split into LOCAL-source (src in own rows — no
    # dependence on the all_to_all, aggregates while the exchange is in
    # flight) and REMOTE-source (src in the received halo buffer) subsets;
    # ``*_eid`` carries canonical per-shard edge ids so dropout masks
    # match the unsplit layout (``ops/dropout.py``).
    loc_src: object = None     # [G, E_loc] int32 (own-rows space)
    loc_dst: object = None     # [G, E_loc] int32
    loc_etype: object = None   # [G, E_loc] int32
    loc_mask: object = None    # [G, E_loc] float32
    loc_eid: object = None     # [G, E_loc] int32
    rem_src: object = None     # [G, E_rem] int32 (halo-BUFFER space)
    rem_dst: object = None     # [G, E_rem] int32
    rem_etype: object = None   # [G, E_rem] int32
    rem_mask: object = None    # [G, E_rem] float32
    rem_eid: object = None     # [G, E_rem] int32
    blocked_loc: object = None  # BlockedGraph, src space = rows
    blocked_rem: object = None  # BlockedGraph, src space = G*Hp
    overlap: bool = dataclasses.field(
        default=False, metadata={"static": True}
    )
    num_shards: int = dataclasses.field(
        default=1, metadata={"static": True}
    )
    rows_per_shard: int = dataclasses.field(
        default=0, metadata={"static": True}
    )
    halo_pair: int = dataclasses.field(default=0, metadata={"static": True})
    # Global padded node count == num_shards * rows_per_shard.
    num_nodes: int = dataclasses.field(default=0, metadata={"static": True})
    num_real_edges: int = dataclasses.field(
        default=0, metadata={"static": True}
    )
    mesh: Optional[Mesh] = dataclasses.field(
        default=None, metadata={"static": True}
    )

    def with_mesh(self, mesh: Mesh) -> "HaloGraph":
        return dataclasses.replace(self, mesh=mesh)

    def exchange_bytes_per_device(self, feat_bytes: int) -> int:
        """Off-device bytes each device SENDS per layer per direction
        (``feat_bytes`` = H*F*itemsize)."""
        return (self.num_shards - 1) * self.halo_pair * feat_bytes

    def replication_bytes_per_device(self, feat_bytes: int) -> int:
        """What round-1's full-replication v1 shipped instead."""
        g = self.num_shards
        return (g - 1) * self.rows_per_shard * feat_bytes


def halo_rows_per_shard(
    num_real_nodes: int,
    num_shards: int,
    *,
    blocked: bool = False,
    block_nodes: int = 128,
) -> int:
    """Destination rows owned per shard — the single source of truth for the
    contiguous node-range partition used by :func:`build_halo_graph` (and by
    ``data/partition.py``, which must pack its clusters into exactly these
    ranges)."""
    row_mult = block_nodes if blocked else 8
    return _round_up(
        -(-(int(num_real_nodes) + 1) // int(num_shards)), row_mult
    )


def build_halo_graph(
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    num_real_nodes: int,
    num_shards: int,
    *,
    blocked: bool = False,
    block_nodes: int = 128,
    chunk_edges: int = 256,
    edge_pad_multiple: int = 8,
    overlap: bool = False,
    scan_segments: int = 0,
) -> HaloGraph:
    """Host-side halo plan. Only REAL edges go in; per-shard layouts make
    their own masked padding. Node space is padded to
    ``num_shards * rows_per_shard`` (callers pad embeddings to
    ``HaloGraph.num_nodes``).

    ``scan_segments > 1`` (Pallas only) builds per-shard SCANNED segment
    stacks instead of single-shot blocked layouts: each device lax.scans
    the fused kernels over its shard's dst/src segments, bounding per-edge
    gather memory to E_shard/S — what makes >8M-edge-per-shard graphs
    trainable at multi-chip scale. Mutually exclusive with ``overlap``
    (the scanned VJP yields final rows, not mergeable softmax partials;
    at the scales that need scanning, per-shard compute dwarfs the
    boundary all_to_all, so serializing the exchange costs ~nothing —
    docs/SCALING.md comm/compute columns)."""
    if scan_segments > 1 and overlap:
        raise ValueError(
            "scan_segments > 1 requires overlap=False (the scanned "
            "propagate has no partial-merge form; callers disable overlap "
            "when scanning)"
        )
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    etype = np.asarray(etype, np.int64)
    g = int(num_shards)

    rows = halo_rows_per_shard(
        num_real_nodes, g, blocked=blocked, block_nodes=block_nodes
    )
    shard_of = np.minimum(dst // rows, g - 1)

    # --- per-(dest, owner) boundary sets --------------------------------
    # Own-shard sources (owner == dest) are read directly from the local
    # feature rows — only true cross-shard boundaries ride the all_to_all.
    per_shard = []
    need = [[None] * g for _ in range(g)]
    for d in range(g):
        sel = shard_of == d
        s_d, d_d, e_d = src[sel], dst[sel], etype[sel]
        order = np.argsort(d_d, kind="stable")
        s_d, d_d, e_d = s_d[order], d_d[order] - d * rows, e_d[order]
        owners = s_d // rows
        for o in range(g):
            if o == d:
                need[d][o] = np.zeros((0,), np.int64)
            else:
                need[d][o] = np.unique(s_d[owners == o] - o * rows)
        per_shard.append((s_d, d_d, e_d, owners))

    hp_mult = block_nodes if blocked else 8
    hp = max(
        hp_mult,
        _round_up(
            max(
                (int(need[d][o].shape[0]) for d in range(g) for o in range(g)),
                default=1,
            ),
            hp_mult,
        ),
    )

    send_idx = np.zeros((g, g, hp), np.int32)
    for d in range(g):
        for o in range(g):
            n = need[d][o].shape[0]
            send_idx[o, d, :n] = need[d][o]

    # --- per-shard edge arrays in halo space ----------------------------
    e_sh = max(
        edge_pad_multiple,
        _round_up(
            max((p[0].shape[0] for p in per_shard), default=1) or 1,
            edge_pad_multiple,
        ),
    )
    src_h = np.zeros((g, e_sh), np.int32)
    dst_l = np.full((g, e_sh), rows - 1, np.int32)
    et_s = np.zeros((g, e_sh), np.int32)
    mask_s = np.zeros((g, e_sh), np.float32)
    halo_src_per_shard = []
    for d in range(g):
        s_d, d_d, e_d, owners = per_shard[d]
        n = s_d.shape[0]
        # halo-space source id: local rows for own-shard sources, else
        # rows + owner*hp + slot inside the owner's send list for d.
        halo = np.zeros(n, np.int64)
        for o in range(g):
            m = owners == o
            if not m.any():
                continue
            if o == d:
                halo[m] = s_d[m] - d * rows
            else:
                halo[m] = rows + o * hp + np.searchsorted(
                    need[d][o], s_d[m] - o * rows
                )
        halo_src_per_shard.append(halo)
        src_h[d, :n] = halo
        dst_l[d, :n] = d_d
        et_s[d, :n] = e_d
        mask_s[d, :n] = 1.0

    blocked_graph = None
    if blocked and not overlap:
        # Per-device layouts in halo space: dst local, src = halo-buffer
        # id. Only the NON-overlapped propagate reads this unsplit layout
        # — the overlap path (the trainer default) aggregates its
        # local/remote subsets through blocked_loc/blocked_rem below, so
        # building the unsplit one there would be dead device arrays.
        shard_lists = [
            (halo_src_per_shard[d], per_shard[d][1], per_shard[d][2])
            for d in range(g)
        ]
        if scan_segments > 1:
            from relgat_projector_tpu.data.blocked import (
                build_scanned_shards,
            )

            blocked_graph = build_scanned_shards(
                shard_lists,
                rows,
                rows + g * hp,
                scan_segments,
                block_nodes=block_nodes,
                chunk_edges=chunk_edges,
            )
        else:
            from relgat_projector_tpu.data.blocked import (
                build_blocked_shards,
            )

            blocked_graph = build_blocked_shards(
                shard_lists,
                rows,
                rows + g * hp,
                block_nodes=block_nodes,
                chunk_edges=chunk_edges,
            )

    # --- comm/compute-overlap split -------------------------------------
    # Local-source vs remote-source subsets per shard, padded to common
    # widths. Canonical edge ids = position in the shard's (dst-sorted)
    # edge list — the ids the UNSPLIT layout hashes for dropout, so both
    # paths replay identical masks for the same seed.
    extra = {}
    if overlap:
        loc_lists, rem_lists = [], []
        for d in range(g):
            s_d, d_d, e_d, owners = per_shard[d]
            eid = np.arange(s_d.shape[0], dtype=np.int64)
            sel = owners == d
            loc_lists.append(
                (s_d[sel] - d * rows, d_d[sel], e_d[sel], eid[sel])
            )
            halo_ids = halo_src_per_shard[d]
            rsel = ~sel
            rem_lists.append(
                (halo_ids[rsel] - rows, d_d[rsel], e_d[rsel], eid[rsel])
            )

        def pad_stack(lists):
            e_max = max(
                edge_pad_multiple,
                _round_up(
                    max((x[0].shape[0] for x in lists), default=1) or 1,
                    edge_pad_multiple,
                ),
            )
            srcs = np.zeros((g, e_max), np.int32)
            dsts = np.full((g, e_max), rows - 1, np.int32)
            ets = np.zeros((g, e_max), np.int32)
            masks = np.zeros((g, e_max), np.float32)
            eids = np.zeros((g, e_max), np.int32)
            for d, (s_a, d_a, e_a, i_a) in enumerate(lists):
                n = s_a.shape[0]
                srcs[d, :n] = s_a
                dsts[d, :n] = d_a
                ets[d, :n] = e_a
                masks[d, :n] = 1.0
                eids[d, :n] = i_a
            return srcs, dsts, ets, masks, eids

        ls, ld, le, lm, li = pad_stack(loc_lists)
        rs, rd, re_, rm, ri = pad_stack(rem_lists)
        extra = dict(
            loc_src=jnp.asarray(ls), loc_dst=jnp.asarray(ld),
            loc_etype=jnp.asarray(le), loc_mask=jnp.asarray(lm),
            loc_eid=jnp.asarray(li),
            rem_src=jnp.asarray(rs), rem_dst=jnp.asarray(rd),
            rem_etype=jnp.asarray(re_), rem_mask=jnp.asarray(rm),
            rem_eid=jnp.asarray(ri),
            overlap=True,
        )
        if blocked:
            from relgat_projector_tpu.data.blocked import (
                build_blocked_shards,
            )

            extra["blocked_loc"] = build_blocked_shards(
                loc_lists, rows, rows,
                block_nodes=block_nodes, chunk_edges=chunk_edges,
            )
            extra["blocked_rem"] = build_blocked_shards(
                rem_lists, rows, g * hp,
                block_nodes=block_nodes, chunk_edges=chunk_edges,
            )

    # Overlap mode aggregates exclusively through the local/remote split
    # arrays — the unsplit per-shard edge arrays would be dead device
    # uploads there (same reasoning as the skipped unsplit blocked layout).
    return HaloGraph(
        **extra,
        send_idx=jnp.asarray(send_idx),
        src_halo=None if overlap else jnp.asarray(src_h),
        dst_local=None if overlap else jnp.asarray(dst_l),
        etype=None if overlap else jnp.asarray(et_s),
        mask=None if overlap else jnp.asarray(mask_s),
        blocked=blocked_graph,
        num_shards=g,
        rows_per_shard=rows,
        halo_pair=hp,
        num_nodes=g * rows,
        num_real_edges=int(src.shape[0]),
    )


def place_halo_graph(mesh: Mesh, hg: HaloGraph) -> HaloGraph:
    """Attach the mesh and put every per-shard leaf on its ``graph``-axis
    row (replicated across ``data``). Multi-process safe: each process
    uploads only its addressable shards of the [G, ...] stacks
    (``put_global``)."""
    from relgat_projector_tpu.parallel.sharded import put_global

    def put(x):
        return put_global(mesh, x, P(GRAPH_AXIS))

    # Every array leaf (incl. the blocked layouts and the overlap split)
    # is stacked [G, ...]; static fields survive the tree_map untouched.
    placed = jax.tree_util.tree_map(put, hg)
    return dataclasses.replace(placed, mesh=mesh)


def halo_propagate(
    h: jax.Array,              # [G*rows, H, F] node features (node-sharded)
    attn_bank: jax.Array,      # [H, R, F]
    rel_bias: Optional[jax.Array],
    hg: HaloGraph,
    *,
    use_pallas: bool = False,
    negative_slope: float = 0.2,
    eps: float = 1e-16,
    attn_dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    kernel_precision: str = "highest",
) -> jax.Array:
    """Boundary-only halo-exchange propagate; returns the node-sharded
    ``[G*rows, H, F]`` aggregate.

    Composes with tensor parallelism over heads: when the mesh has a
    ``model`` axis > 1, ``h`` is additionally sharded on the heads axis and
    the per-head ``attn`` bank on its leading axis — each device owns a
    (dst-range, head-range) tile, runs the unmodified local propagate on
    its head slice (heads are independent until the concat, reference
    ``layer.py:321``), and the halo exchange ships only that head slice,
    so exchange bandwidth also splits across ``model``.
    """
    if hg.mesh is None:
        raise ValueError(
            "HaloGraph has no mesh attached; call with_mesh()/"
            "place_halo_graph() first"
        )
    mesh = hg.mesh
    g, hp, rows = hg.num_shards, hg.halo_pair, hg.rows_per_shard
    num_rel = attn_bank.shape[1]
    use_bias = rel_bias is not None
    bias_arg = rel_bias if use_bias else jnp.zeros((num_rel,), jnp.float32)
    use_dropout = attn_dropout_rate > 0.0 and dropout_rng is not None
    rng_arg = dropout_rng if use_dropout else jax.random.PRNGKey(0)
    run_pallas = use_pallas and hg.blocked is not None
    from relgat_projector_tpu.data.blocked import ScannedBlockedGraph

    run_scanned = run_pallas and isinstance(hg.blocked, ScannedBlockedGraph)

    if hg.overlap:
        return _halo_propagate_overlapped(
            h, attn_bank, bias_arg, rng_arg, hg,
            use_bias=use_bias,
            use_dropout=use_dropout,
            run_pallas=use_pallas and hg.blocked_loc is not None,
            negative_slope=negative_slope, eps=eps,
            attn_dropout_rate=attn_dropout_rate,
            kernel_precision=kernel_precision,
        )

    def local_fn(h_loc, attn, bias, rng, send_idx, sx, dl, et, mask,
                 blocked):
        # h_loc: [rows, H_local, F] — this device's (dst-range, head-range)
        # feature tile; head count comes from the LOCAL attn bank.
        heads, _, f = attn.shape
        hf = heads * f
        h2 = h_loc.reshape(rows, hf)
        send = jnp.take(
            h2, send_idx[0].reshape(-1), axis=0, mode="clip"
        ).reshape(g, hp, hf)
        halo = jax.lax.all_to_all(send, GRAPH_AXIS, 0, 0)  # [G, Hp, HF]
        # Halo space = own rows ++ received boundary rows.
        h_halo = jnp.concatenate(
            [h2, halo.reshape(g * hp, hf)], axis=0
        ).reshape(rows + g * hp, heads, f)

        local_rng = None
        if use_dropout:
            # Independent masks per (graph shard, head shard): the in-mask
            # head index is LOCAL, so the seed must vary across the model
            # axis too.
            local_rng = jax.random.fold_in(
                jax.random.fold_in(rng, jax.lax.axis_index(GRAPH_AXIS)),
                jax.lax.axis_index(MODEL_AXIS),
            )
        if run_pallas:
            local = jax.tree_util.tree_map(lambda x: x[0], blocked)
            kw = dict(
                negative_slope=negative_slope, eps=eps,
                attn_dropout_rate=(
                    attn_dropout_rate if use_dropout else 0.0
                ),
                dropout_rng=local_rng,
                kernel_precision=kernel_precision,
            )
            if run_scanned:
                # Segment-scanned per-shard propagate: only E_shard/S of
                # gather streams live at once (ops/pallas/kernels.py).
                from relgat_projector_tpu.ops.pallas.kernels import (
                    relgat_propagate_pallas_scanned,
                )

                return relgat_propagate_pallas_scanned(
                    h_halo, attn, bias if use_bias else None, local, **kw
                )
            from relgat_projector_tpu.ops.pallas.kernels import (
                relgat_propagate_pallas,
            )

            return relgat_propagate_pallas(
                h_halo, attn, bias if use_bias else None, local, **kw
            )
        from relgat_projector_tpu.ops.relgat_ops import relgat_propagate

        return relgat_propagate(
            h_halo, attn, bias if use_bias else None,
            sx[0], dl[0], et[0],
            num_nodes=rows,
            negative_slope=negative_slope, eps=eps,
            attn_dropout_rate=attn_dropout_rate if use_dropout else 0.0,
            dropout_rng=local_rng,
            edges_sorted_by_dst=True,
            edge_mask=mask[0],
        )

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(GRAPH_AXIS, MODEL_AXIS),   # h: nodes x heads tile
            P(MODEL_AXIS), P(), P(),     # attn bank sharded on heads
            P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
            P(GRAPH_AXIS), P(GRAPH_AXIS),
        ),
        out_specs=P(GRAPH_AXIS, MODEL_AXIS),
        check_vma=False,
    )
    return fn(
        h, attn_bank, bias_arg, rng_arg,
        hg.send_idx, hg.src_halo, hg.dst_local, hg.etype, hg.mask,
        hg.blocked,
    )


def _halo_propagate_overlapped(
    h: jax.Array,
    attn_bank: jax.Array,
    bias_arg: jax.Array,
    rng_arg: jax.Array,
    hg: HaloGraph,
    *,
    use_bias: bool,
    use_dropout: bool,
    run_pallas: bool,
    negative_slope: float,
    eps: float,
    attn_dropout_rate: float,
    kernel_precision: str,
) -> jax.Array:
    """Comm/compute-overlapped halo propagate (SURVEY.md §5.7's "overlapped
    with local segment aggregation").

    Each shard's edges are pre-split (``build_halo_graph(overlap=True)``)
    into LOCAL-source edges — aggregated straight from the shard's own
    feature rows, with no data dependence on the exchange — and
    REMOTE-source edges aggregated from the received halo buffer. The two
    partial aggregations carry online-softmax state ``(m, l, acc, bias)``
    and merge flash-style (algebraically identical to one softmax over the
    union), so XLA's scheduler is free to run the boundary ``all_to_all``
    concurrently with the local subset's SDDMM/segment work instead of
    serializing exchange -> aggregate. Numerics (incl. dropout masks,
    which hash canonical per-shard edge ids) match the unsplit path
    bit-for-pattern; see tests/test_halo.py."""
    mesh = hg.mesh
    g, hp, rows = hg.num_shards, hg.halo_pair, hg.rows_per_shard

    def local_fn(
        h_loc, attn, bias, rng, send_idx,
        l_src, l_dst, l_et, l_mask, l_eid,
        r_src, r_dst, r_et, r_mask, r_eid,
        bl_loc, bl_rem,
    ):
        heads, _, f = attn.shape
        hf = heads * f
        h2 = h_loc.reshape(rows, hf)
        send = jnp.take(
            h2, send_idx[0].reshape(-1), axis=0, mode="clip"
        ).reshape(g, hp, hf)
        halo = jax.lax.all_to_all(send, GRAPH_AXIS, 0, 0)  # [G, Hp, HF]
        halo3 = halo.reshape(g * hp, heads, f)
        h_own3 = h_loc.reshape(rows, heads, f)

        local_rng = None
        if use_dropout:
            local_rng = jax.random.fold_in(
                jax.random.fold_in(rng, jax.lax.axis_index(GRAPH_AXIS)),
                jax.lax.axis_index(MODEL_AXIS),
            )

        if run_pallas:
            from relgat_projector_tpu.ops.pallas.kernels import (
                relgat_propagate_pallas_overlapped,
            )

            return relgat_propagate_pallas_overlapped(
                h_own3, halo3, attn, bias if use_bias else None,
                jax.tree_util.tree_map(lambda x: x[0], bl_loc),
                jax.tree_util.tree_map(lambda x: x[0], bl_rem),
                negative_slope=negative_slope, eps=eps,
                attn_dropout_rate=(
                    attn_dropout_rate if use_dropout else 0.0
                ),
                dropout_rng=local_rng,
                kernel_precision=kernel_precision,
            )

        from relgat_projector_tpu.ops.relgat_ops import (
            merge_propagate_partials,
            relgat_propagate_partial,
        )

        kw = dict(
            num_out=rows,
            negative_slope=negative_slope,
            attn_dropout_rate=attn_dropout_rate if use_dropout else 0.0,
            dropout_rng=local_rng,
            edges_sorted_by_dst=True,
        )
        p_loc = relgat_propagate_partial(
            h_own3, attn, bias if use_bias else None,
            l_src[0], l_dst[0], l_et[0],
            edge_mask=l_mask[0], dropout_edge_ids=l_eid[0], **kw,
        )
        p_rem = relgat_propagate_partial(
            halo3, attn, bias if use_bias else None,
            r_src[0], r_dst[0], r_et[0],
            edge_mask=r_mask[0], dropout_edge_ids=r_eid[0], **kw,
        )
        return merge_propagate_partials([p_loc, p_rem], eps=eps)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(GRAPH_AXIS, MODEL_AXIS),   # h: nodes x heads tile
            P(MODEL_AXIS), P(), P(),     # attn bank sharded on heads
            P(GRAPH_AXIS),               # send_idx
            P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
            P(GRAPH_AXIS),               # local split
            P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
            P(GRAPH_AXIS),               # remote split
            P(GRAPH_AXIS), P(GRAPH_AXIS),  # blocked_loc / blocked_rem
        ),
        out_specs=P(GRAPH_AXIS, MODEL_AXIS),
        check_vma=False,
    )
    return fn(
        h, attn_bank, bias_arg, rng_arg, hg.send_idx,
        hg.loc_src, hg.loc_dst, hg.loc_etype, hg.loc_mask, hg.loc_eid,
        hg.rem_src, hg.rem_dst, hg.rem_etype, hg.rem_mask, hg.rem_eid,
        hg.blocked_loc, hg.blocked_rem,
    )
