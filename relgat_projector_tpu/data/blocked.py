"""Block-padded edge layout for the Pallas TPU kernels.

The scatter/gather-free TPU formulation: partition destination nodes into
blocks of ``TD`` rows; each block's (dst-sorted, hence contiguous) edge run
is padded to a multiple of the chunk size ``TE``. A kernel then walks chunks
sequentially — every chunk belongs to exactly one dst block — and turns
"scatter-add per destination" into ``onehot([TD, TE]) @ msgs([TE, F])``:
a dense MXU matmul per (chunk, head). No dynamic scatter anywhere.

Padding slots keep global dst-sortedness (they sit at the end of their
block's run with ``dst = block_end - 1``) and are neutralized by ``mask``:
masked edges get ``-inf`` attention logits, so their softmax weight — and
therefore their aggregation contribution — is exactly zero, and their
relation-bias term is masked out. This mirrors how the plain padded layout
neutralizes its tail edges (``data/graph.py``), but works mid-array.

A second, src-blocked layout of the same form drives the backward scatter
(dL/dh accumulates per SOURCE node).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedEdges:
    """One block-padded edge ordering (by dst for fwd, by src for bwd)."""

    src: jax.Array          # [E_bp] int32 gather index per slot
    dst: jax.Array          # [E_bp] int32 (non-decreasing for dst-blocking)
    etype: jax.Array        # [E_bp] int32
    mask: jax.Array         # [E_bp] float32, 1.0 = real edge
    local_seg: jax.Array    # [E_bp] int32, seg - block*TD in [0, TD)
    chunk_block: jax.Array  # [C] int32 block id per chunk
    slot_of_edge: jax.Array  # [E_canonical] int32: canonical edge -> slot
    block_nonempty: jax.Array  # [num_blocks] float32: 1.0 if block has edges
    # (kernel output blocks with no chunks are never written -> garbage;
    # callers must zero rows of empty blocks via this mask)
    chunk_meta: jax.Array   # [C, 8, TE] int32 — per-chunk edge metadata with
    # a sublane-aligned shape for TPU BlockSpecs (last two dims (8, TE)):
    # row 0 = etype, row 1 = local_seg, row 2 = mask (0/1), rows 3-7 unused
    edge_of_slot: jax.Array  # [E_bp] int32: canonical edge index per slot
    # (padding slots repeat the block's last real edge; only meaningful
    # where mask == 1)
    block_nodes: int = dataclasses.field(metadata={"static": True})
    chunk_edges: int = dataclasses.field(metadata={"static": True})
    num_blocks: int = dataclasses.field(metadata={"static": True})

    @property
    def num_slots(self) -> int:
        return int(self.src.shape[0])

    @property
    def num_chunks(self) -> int:
        return int(self.chunk_block.shape[0])


def _build_one(
    seg_key: np.ndarray,   # sort/partition key (dst for fwd, src for bwd)
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    num_nodes: int,
    block_nodes: int,
    chunk_edges: int,
) -> BlockedEdges:
    # Fast path: native C++ builder (native/graphbuild.cpp via ctypes).
    if seg_key.shape[0] > 0:
        from relgat_projector_tpu.data.native import native_blocked_arrays

        arrs = native_blocked_arrays(
            seg_key,
            src.astype(np.int32),
            dst.astype(np.int32),
            etype.astype(np.int32),
            num_nodes,
            block_nodes,
            chunk_edges,
        )
        if arrs is not None:
            return BlockedEdges(
                src=jnp.asarray(arrs["src"]),
                dst=jnp.asarray(arrs["dst"]),
                etype=jnp.asarray(arrs["etype"]),
                mask=jnp.asarray(arrs["mask"]),
                local_seg=jnp.asarray(arrs["local_seg"]),
                chunk_block=jnp.asarray(arrs["chunk_block"]),
                slot_of_edge=jnp.asarray(arrs["slot_of_edge"]),
                block_nonempty=jnp.asarray(arrs["block_nonempty"]),
                chunk_meta=jnp.asarray(arrs["chunk_meta"]),
                edge_of_slot=jnp.asarray(arrs["edge_of_slot"]),
                block_nodes=int(block_nodes),
                chunk_edges=int(chunk_edges),
                num_blocks=-(-num_nodes // block_nodes),
            )

    e = seg_key.shape[0]
    order = np.argsort(seg_key, kind="stable")
    key_s = seg_key[order]
    num_blocks = -(-num_nodes // block_nodes)

    block_of_edge = key_s // block_nodes
    counts = np.bincount(block_of_edge, minlength=num_blocks)
    padded_counts = -(-counts // chunk_edges) * chunk_edges
    # Blocks with zero edges get zero chunks (skipped entirely).
    slots_total = int(padded_counts.sum())

    out_slot_start = np.zeros(num_blocks + 1, dtype=np.int64)
    np.cumsum(padded_counts, out=out_slot_start[1:])
    in_start = np.zeros(num_blocks + 1, dtype=np.int64)
    np.cumsum(counts, out=in_start[1:])

    src_b = np.zeros(slots_total, np.int32)
    dst_b = np.zeros(slots_total, np.int32)
    et_b = np.zeros(slots_total, np.int32)
    mask_b = np.zeros(slots_total, np.float32)
    seg_b = np.zeros(slots_total, np.int64)
    edge_of_slot = np.zeros(slots_total, np.int64)
    slot_of_sorted = np.zeros(e, np.int64)

    src_s, dst_s, et_s = src[order], dst[order], etype[order]
    for b in np.nonzero(counts)[0]:
        i0, i1 = in_start[b], in_start[b + 1]
        o0 = out_slot_start[b]
        n = i1 - i0
        src_b[o0 : o0 + n] = src_s[i0:i1]
        dst_b[o0 : o0 + n] = dst_s[i0:i1]
        et_b[o0 : o0 + n] = et_s[i0:i1]
        mask_b[o0 : o0 + n] = 1.0
        seg_b[o0 : o0 + n] = key_s[i0:i1]
        edge_of_slot[o0 : o0 + n] = order[i0:i1]
        slot_of_sorted[i0:i1] = np.arange(o0, o0 + n)
        # Padding slots: keep the partition key inside the block and
        # non-decreasing; masked so they contribute nothing.
        pad_end = out_slot_start[b + 1]
        if pad_end > o0 + n:
            pad_key = key_s[i1 - 1]
            seg_b[o0 + n : pad_end] = pad_key
            # src/dst of padding slots point at a real node (block-local) so
            # gathers stay in-bounds; mask kills their contribution.
            src_b[o0 + n : pad_end] = src_s[i1 - 1]
            dst_b[o0 + n : pad_end] = dst_s[i1 - 1]
            edge_of_slot[o0 + n : pad_end] = order[i1 - 1]

    chunk_block = np.repeat(
        np.arange(num_blocks), (padded_counts // chunk_edges)
    ).astype(np.int32)

    slot_of_edge = np.zeros(e, np.int64)
    slot_of_edge[order] = slot_of_sorted

    local_seg = (seg_b - (seg_b // block_nodes) * block_nodes).astype(np.int32)

    if slots_total == 0:  # degenerate empty graph
        slots_total = chunk_edges
        src_b = np.zeros(slots_total, np.int32)
        dst_b = np.zeros(slots_total, np.int32)
        et_b = np.zeros(slots_total, np.int32)
        mask_b = np.zeros(slots_total, np.float32)
        local_seg = np.zeros(slots_total, np.int32)
        edge_of_slot = np.zeros(slots_total, np.int64)
        chunk_block = np.zeros(1, np.int32)

    block_nonempty = (counts > 0).astype(np.float32)

    num_chunks = max(1, slots_total // chunk_edges)
    chunk_meta = np.zeros((num_chunks, 8, chunk_edges), np.int32)
    chunk_meta[:, 0, :] = et_b.reshape(num_chunks, chunk_edges)
    chunk_meta[:, 1, :] = local_seg.reshape(num_chunks, chunk_edges)
    chunk_meta[:, 2, :] = mask_b.reshape(num_chunks, chunk_edges).astype(
        np.int32
    )
    # Row 3: canonical edge id per slot — the replayable attention-dropout
    # masks hash on it (``ops/dropout.py``); layout-order independent.
    chunk_meta[:, 3, :] = edge_of_slot.reshape(
        num_chunks, chunk_edges
    ).astype(np.int32)

    return BlockedEdges(
        src=jnp.asarray(src_b),
        dst=jnp.asarray(dst_b),
        etype=jnp.asarray(et_b),
        mask=jnp.asarray(mask_b),
        local_seg=jnp.asarray(local_seg),
        chunk_block=jnp.asarray(chunk_block),
        slot_of_edge=jnp.asarray(slot_of_edge.astype(np.int32)),
        block_nonempty=jnp.asarray(block_nonempty),
        chunk_meta=jnp.asarray(chunk_meta),
        edge_of_slot=jnp.asarray(edge_of_slot.astype(np.int32)),
        block_nodes=int(block_nodes),
        chunk_edges=int(chunk_edges),
        num_blocks=int(num_blocks),
    )


def pad_blocked_edges(
    be: BlockedEdges, num_chunks: int, num_edges_canonical: int = 0
) -> BlockedEdges:
    """Pad a blocked layout to exactly ``num_chunks`` chunks (and the
    matching ``num_chunks * TE`` slots) so layouts from differently-sized
    graph shards stack into one ``[G, ...]`` pytree with identical shapes
    (``parallel/pallas_sharded.py``).

    Padding chunks repeat the LAST real chunk's block id with fully-masked
    metadata: the kernels re-accumulate zero and idempotently re-write that
    block's already-final output, so results are unchanged.
    ``slot_of_edge`` is padded to ``num_edges_canonical`` (it indexes
    canonical edges, whose count also differs per shard; only callers that
    track canonical edges read it)."""
    te = be.chunk_edges
    c = be.num_chunks
    if num_chunks < c:
        raise ValueError(f"cannot shrink {c} chunks to {num_chunks}")
    extra_c = num_chunks - c
    extra_s = extra_c * te

    def pad_slots(arr, fill_from_last: bool):
        arr = np.asarray(arr)
        if extra_s == 0:
            return jnp.asarray(arr)
        fill = arr[-1] if fill_from_last and arr.shape[0] else 0
        return jnp.asarray(
            np.concatenate([arr, np.full((extra_s,), fill, arr.dtype)])
        )

    cb = np.asarray(be.chunk_block)
    cb_fill = cb[-1] if cb.shape[0] else 0
    chunk_block = jnp.asarray(
        np.concatenate([cb, np.full((extra_c,), cb_fill, cb.dtype)])
    )
    meta = np.asarray(be.chunk_meta)
    chunk_meta = jnp.asarray(
        np.concatenate(
            [meta, np.zeros((extra_c, 8, te), meta.dtype)], axis=0
        )
    )
    soe = np.asarray(be.slot_of_edge)
    if num_edges_canonical < soe.shape[0]:
        num_edges_canonical = soe.shape[0]
    slot_of_edge = jnp.asarray(
        np.concatenate(
            [soe, np.zeros((num_edges_canonical - soe.shape[0],), soe.dtype)]
        )
    )
    return BlockedEdges(
        src=pad_slots(be.src, True),
        dst=pad_slots(be.dst, True),
        etype=pad_slots(be.etype, False),
        mask=pad_slots(be.mask, False),
        local_seg=pad_slots(be.local_seg, False),
        chunk_block=chunk_block,
        slot_of_edge=slot_of_edge,
        block_nonempty=be.block_nonempty,
        chunk_meta=chunk_meta,
        edge_of_slot=pad_slots(be.edge_of_slot, True),
        block_nodes=be.block_nodes,
        chunk_edges=be.chunk_edges,
        num_blocks=be.num_blocks,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedGraph:
    """dst-blocked (forward aggregation) + src-blocked (backward scatter)."""

    by_dst: BlockedEdges
    by_src: BlockedEdges
    # [E_bp_src] int32: for each src-blocked slot, the dst-blocked slot of
    # the same canonical edge — permutes per-edge gradients from dst order
    # into src order for the backward scatter.
    dst_slot_of_src_slot: jax.Array
    num_nodes: int = dataclasses.field(metadata={"static": True})


def build_blocked_shards(
    per_shard_edges,
    dst_space: int,
    src_space: int,
    *,
    block_nodes: int = 128,
    chunk_edges: int = 512,
) -> BlockedGraph:
    """Per-device blocked layouts, stacked ``[G, ...]`` on every leaf.

    ``per_shard_edges`` is a list of ``(src, dst, etype)`` triples — one per
    shard — with ``dst`` in the LOCAL output space ``[0, dst_space)`` and
    ``src`` in the shared gather space ``[0, src_space)`` (global node ids
    for the replicated-feature path, halo-buffer ids for the halo path).
    Shards are padded to a common chunk count so the layouts stack into one
    pytree with identical static metadata (``BlockedGraph.num_nodes`` is
    the local dst space). Consumed inside ``shard_map`` by
    ``parallel/pallas_sharded.py`` and ``parallel/halo.py``.
    """
    per_dst, per_src = [], []
    for s, d, e in per_shard_edges:
        per_dst.append(
            _build_one(d, s, d, e, dst_space, block_nodes, chunk_edges)
        )
        per_src.append(
            _build_one(s, s, d, e, src_space, block_nodes, chunk_edges)
        )

    cd = max(be.num_chunks for be in per_dst)
    cs = max(be.num_chunks for be in per_src)
    emax = max(
        1,
        max(int(np.asarray(be.slot_of_edge).shape[0]) for be in per_dst),
    )

    shards = []
    for g in range(len(per_shard_edges)):
        bd = pad_blocked_edges(per_dst[g], cd, emax)
        bsrc = pad_blocked_edges(per_src[g], cs, emax)
        # Per-edge grad permutation (only the v1 backward oracle reads it);
        # padded slots map to slot 0.
        e_real = int(np.asarray(per_src[g].edge_of_slot).shape[0])
        if int(np.asarray(per_dst[g].slot_of_edge).shape[0]) > 0:
            perm = np.asarray(bd.slot_of_edge)[
                np.asarray(per_src[g].edge_of_slot)
            ]
            perm = np.concatenate(
                [perm, np.zeros(bsrc.num_slots - e_real, np.int64)]
            )
        else:
            perm = np.zeros(bsrc.num_slots, np.int64)
        shards.append(
            BlockedGraph(
                by_dst=bd,
                by_src=bsrc,
                dst_slot_of_src_slot=jnp.asarray(perm.astype(np.int32)),
                num_nodes=int(dst_space),
            )
        )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *shards)


def build_blocked_graph(
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    num_nodes: int,
    *,
    block_nodes: int = 128,
    chunk_edges: int = 512,
) -> BlockedGraph:
    """``num_nodes`` must already be the padded node count; only REAL edges
    should be passed (the blocked layouts make their own padding)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    etype = np.asarray(etype, np.int64)
    by_dst = _build_one(
        dst, src, dst, etype, num_nodes, block_nodes, chunk_edges
    )
    by_src = _build_one(
        src, src, dst, etype, num_nodes, block_nodes, chunk_edges
    )
    if src.shape[0] > 0:
        perm = np.asarray(by_dst.slot_of_edge)[np.asarray(by_src.edge_of_slot)]
    else:
        perm = np.zeros(by_src.num_slots, np.int64)
    return BlockedGraph(
        by_dst=by_dst,
        by_src=by_src,
        dst_slot_of_src_slot=jnp.asarray(perm.astype(np.int32)),
        num_nodes=int(num_nodes),
    )
