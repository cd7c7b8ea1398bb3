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

Layout construction is host-side (NumPy + the native C++ builder,
``native/graphbuild.cpp``); ``chunk_meta`` — the single largest layout
array — is assembled ON DEVICE from the slot arrays it rearranges, cutting
layout upload bytes ~60% (the one-time build at 8M edges was dominated by
host->device transfer through this image's relay, BENCH_NOTES.md).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedEdges:
    """One block-padded edge ordering (by dst for fwd, by src for bwd).

    Only the arrays the kernels actually stream live on device: everything
    per-edge the kernels need (etype, local row, mask, canonical edge id)
    is packed into ``chunk_meta``; the dst-blocked layout additionally
    carries ``src`` (the forward's gather index) and the src-blocked one
    carries ``dst`` (the backward's packed-stream gather index). Earlier
    revisions also shipped etype/mask/local_seg/slot_of_edge/edge_of_slot
    as standalone [E_bp] device arrays — ~12 dead edge-sized buffers
    (~800 MB at 16M edges) riding every train step's residuals."""

    src: Optional[jax.Array]  # [E_bp] int32 fwd gather index (by_dst only)
    dst: Optional[jax.Array]  # [E_bp] int32 bwd packed-stream gather index
    #                           (by_src only)
    chunk_block: jax.Array  # [C] int32 block id per chunk
    block_nonempty: jax.Array  # [num_blocks] float32: 1.0 if block has edges
    # (kernel output blocks with no chunks are never written -> garbage;
    # callers must zero rows of empty blocks via this mask)
    chunk_meta: jax.Array   # [C, 8, TE] int32 — per-chunk edge metadata with
    # a sublane-aligned shape for TPU BlockSpecs (last two dims (8, TE)):
    # row 0 = etype, row 1 = local_seg, row 2 = mask (0/1), row 3 =
    # canonical edge id (dropout-mask hash key), rows 4-7 unused
    block_nodes: int = dataclasses.field(metadata={"static": True})
    chunk_edges: int = dataclasses.field(metadata={"static": True})
    num_blocks: int = dataclasses.field(metadata={"static": True})

    @property
    def num_slots(self) -> int:
        return self.num_chunks * self.chunk_edges

    @property
    def num_chunks(self) -> int:
        return int(self.chunk_block.shape[0])


def _chunk_meta_device(
    etype: jax.Array,
    local_seg: jax.Array,
    mask: jax.Array,
    edge_of_slot: jax.Array,
    chunk_edges: int,
) -> jax.Array:
    """Assemble ``chunk_meta [C, 8, TE]`` ON DEVICE from the slot arrays
    (pure rearrangement of arrays that transfer anyway)."""
    c = etype.shape[0] // chunk_edges
    z = jnp.zeros((c, chunk_edges), jnp.int32)
    return jnp.stack(
        [
            etype.reshape(c, chunk_edges),
            local_seg.reshape(c, chunk_edges),
            mask.astype(jnp.int32).reshape(c, chunk_edges),
            edge_of_slot.reshape(c, chunk_edges),
            z, z, z, z,
        ],
        axis=1,
    )


def _build_one_np(
    seg_key: np.ndarray,   # sort/partition key (dst for fwd, src for bwd)
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    num_nodes: int,
    block_nodes: int,
    chunk_edges: int,
) -> Dict[str, np.ndarray]:
    """Host-side layout arrays (no device transfer, no chunk_meta)."""
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
            arrs.pop("chunk_meta", None)
            return arrs

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
            # src/dst of padding slots point at a real node (block-local) so
            # gathers stay in-bounds; mask kills their contribution.
            seg_b[o0 + n : pad_end] = pad_key
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

    return dict(
        src=src_b,
        dst=dst_b,
        etype=et_b,
        mask=mask_b,
        local_seg=local_seg,
        chunk_block=chunk_block,
        slot_of_edge=slot_of_edge.astype(np.int32),
        block_nonempty=(counts > 0).astype(np.float32),
        edge_of_slot=edge_of_slot.astype(np.int32),
    )


def _to_blocked_edges(
    d: Dict[str, np.ndarray],
    num_nodes: int,
    block_nodes: int,
    chunk_edges: int,
    keep: str = "src",
) -> BlockedEdges:
    """Transfer host layout arrays and build ``chunk_meta`` on device.
    ``keep`` selects which gather-index array the runtime needs: "src"
    for dst-blocked (forward) layouts, "dst" for src-blocked (backward)
    ones; the other stays host-side only."""
    et = jnp.asarray(d["etype"])
    mask = jnp.asarray(d["mask"])
    local = jnp.asarray(d["local_seg"])
    eos = jnp.asarray(d["edge_of_slot"])
    return BlockedEdges(
        src=jnp.asarray(d["src"]) if keep == "src" else None,
        dst=jnp.asarray(d["dst"]) if keep == "dst" else None,
        chunk_block=jnp.asarray(d["chunk_block"]),
        block_nonempty=jnp.asarray(d["block_nonempty"]),
        chunk_meta=_chunk_meta_device(et, local, mask, eos, chunk_edges),
        block_nodes=int(block_nodes),
        chunk_edges=int(chunk_edges),
        num_blocks=-(-num_nodes // block_nodes),
    )


def _build_one(
    seg_key: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    num_nodes: int,
    block_nodes: int,
    chunk_edges: int,
    keep: str = "src",
) -> BlockedEdges:
    return _to_blocked_edges(
        _build_one_np(
            seg_key, src, dst, etype, num_nodes, block_nodes, chunk_edges
        ),
        num_nodes,
        block_nodes,
        chunk_edges,
        keep,
    )


def _pad_np(
    d: Dict[str, np.ndarray],
    num_chunks: int,
    chunk_edges: int,
    num_edges_canonical: int = 0,
) -> Dict[str, np.ndarray]:
    """Pad a host-side layout dict to exactly ``num_chunks`` chunks (and the
    matching slot count) so layouts from differently-sized graph shards /
    scan segments stack with identical shapes.

    Padding chunks repeat the LAST real chunk's block id with fully-masked
    metadata: the kernels re-accumulate zero and idempotently re-write that
    block's already-final output, so results are unchanged."""
    te = chunk_edges
    c = d["chunk_block"].shape[0]
    if num_chunks < c:
        raise ValueError(f"cannot shrink {c} chunks to {num_chunks}")
    extra_c = num_chunks - c
    extra_s = extra_c * te

    def pad_slots(arr, fill_from_last):
        if extra_s == 0:
            return arr
        fill = arr[-1] if fill_from_last and arr.shape[0] else 0
        return np.concatenate([arr, np.full((extra_s,), fill, arr.dtype)])

    cb = d["chunk_block"]
    cb_fill = cb[-1] if cb.shape[0] else 0
    soe = d["slot_of_edge"]
    if num_edges_canonical < soe.shape[0]:
        num_edges_canonical = soe.shape[0]
    return dict(
        src=pad_slots(d["src"], True),
        dst=pad_slots(d["dst"], True),
        etype=pad_slots(d["etype"], False),
        mask=pad_slots(d["mask"], False),
        local_seg=pad_slots(d["local_seg"], False),
        chunk_block=np.concatenate(
            [cb, np.full((extra_c,), cb_fill, cb.dtype)]
        ),
        slot_of_edge=np.concatenate(
            [soe, np.zeros((num_edges_canonical - soe.shape[0],), soe.dtype)]
        ),
        block_nonempty=d["block_nonempty"],
        edge_of_slot=pad_slots(d["edge_of_slot"], True),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedGraph:
    """dst-blocked (forward aggregation) + src-blocked (backward) layouts.
    (The v1 backward's per-edge grad permutation is gone with it.)"""

    by_dst: BlockedEdges
    by_src: BlockedEdges
    num_nodes: int = dataclasses.field(metadata={"static": True})


def build_blocked_shards(
    per_shard_edges: Sequence[Tuple[np.ndarray, ...]],
    dst_space: int,
    src_space: int,
    *,
    block_nodes: int = 128,
    chunk_edges: int = 256,
) -> BlockedGraph:
    """Per-device/per-segment blocked layouts, stacked ``[G, ...]``.

    ``per_shard_edges`` is a list of ``(src, dst, etype)`` triples — one per
    shard — with ``dst`` in the LOCAL output space ``[0, dst_space)`` and
    ``src`` in the shared gather space ``[0, src_space)`` (global node ids
    for the replicated-feature path, halo-buffer ids for the halo path).
    An optional 4th element per shard gives each edge's CANONICAL id for
    the dropout hash (``ops/dropout.py``) — used by the overlapped halo
    path, whose local/remote edge SUBSETS must replay the same masks as
    the unsplit layout; defaults to position in the shard's edge list.
    Shards are padded HOST-SIDE to a common chunk count, stacked, and
    transferred once (``chunk_meta`` built on device). Consumed inside
    ``shard_map`` (``parallel/pallas_sharded.py``, ``parallel/halo.py``)
    or ``lax.scan`` (``ops/pallas/kernels.py`` scanned propagate).
    """
    per_dst: List[dict] = []
    per_src: List[dict] = []
    eid_maps: List[Optional[np.ndarray]] = []
    for tup in per_shard_edges:
        s, d, e = (np.asarray(x, np.int64) for x in tup[:3])
        eid_maps.append(
            np.asarray(tup[3], np.int64) if len(tup) > 3 else None
        )
        per_dst.append(
            _build_one_np(d, s, d, e, dst_space, block_nodes, chunk_edges)
        )
        per_src.append(
            _build_one_np(s, s, d, e, src_space, block_nodes, chunk_edges)
        )

    cd = max(x["chunk_block"].shape[0] for x in per_dst)
    cs = max(x["chunk_block"].shape[0] for x in per_src)
    emax = max(1, max(x["slot_of_edge"].shape[0] for x in per_dst))

    for g in range(len(per_shard_edges)):
        per_dst[g] = _pad_np(per_dst[g], cd, chunk_edges, emax)
        per_src[g] = _pad_np(per_src[g], cs, chunk_edges, emax)
        # Remap slot -> CANONICAL edge id for the dropout hash.
        if eid_maps[g] is not None and eid_maps[g].shape[0] > 0:
            for part in (per_dst[g], per_src[g]):
                part["edge_of_slot"] = eid_maps[g][
                    part["edge_of_slot"]
                ].astype(np.int64)

    def stacked_edges(dicts, space, keep):
        st = {
            k: np.stack([d[k] for d in dicts]) for k in dicts[0]
        }
        et = jnp.asarray(st["etype"])
        mask = jnp.asarray(st["mask"])
        local = jnp.asarray(st["local_seg"])
        eos = jnp.asarray(st["edge_of_slot"])
        g, slots = st["etype"].shape
        c = slots // chunk_edges
        meta = _chunk_meta_device(
            et.reshape(g * slots),
            local.reshape(g * slots),
            mask.reshape(g * slots),
            eos.reshape(g * slots),
            chunk_edges,
        ).reshape(g, c, 8, chunk_edges)
        return BlockedEdges(
            src=jnp.asarray(st["src"]) if keep == "src" else None,
            dst=jnp.asarray(st["dst"]) if keep == "dst" else None,
            chunk_block=jnp.asarray(st["chunk_block"]),
            block_nonempty=jnp.asarray(st["block_nonempty"]),
            chunk_meta=meta,
            block_nodes=int(block_nodes),
            chunk_edges=int(chunk_edges),
            num_blocks=-(-space // block_nodes),
        )

    return BlockedGraph(
        by_dst=stacked_edges(per_dst, dst_space, "src"),
        by_src=stacked_edges(per_src, src_space, "dst"),
        num_nodes=int(dst_space),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScannedBlockedGraph:
    """Segment stacks for the memory-bounded SCANNED propagate on one
    device (``ops/pallas/kernels.py``): the forward scans DST-range
    segments; the backward scans SRC-range segments.

    Partitioning the backward by src keeps its blocked layouts dense —
    partitioning it by dst (sharing the forward's segments) scatters each
    segment's edges over ALL src blocks, and per-block chunk padding then
    inflates every segment to ~``num_src_blocks * TE`` slots regardless of
    segment count (measured: 8M edges / 8 segments still produced 3.2M-slot
    segment streams). ``by_src.dst`` stays GLOBAL (for the packed-stream
    gather); the chunk/block structure lives in the LOCAL src space so each
    segment's dh rows concatenate (the backward offsets the local block ids
    into global ``h`` via its second scalar-prefetch array).
    """

    by_dst: BlockedEdges   # stacked [S, ...]; dst LOCAL per segment
    by_src: BlockedEdges   # stacked [S, ...]; src ids GLOBAL, blocks LOCAL
    num_shards: int = dataclasses.field(default=1, metadata={"static": True})
    rows_dst: int = dataclasses.field(default=0, metadata={"static": True})
    rows_src: int = dataclasses.field(default=0, metadata={"static": True})
    num_nodes: int = dataclasses.field(default=0, metadata={"static": True})


def _scanned_family_np(
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    eid: Optional[np.ndarray],
    rows: int,
    num_segments: int,
    by: str,
    block_nodes: int,
    chunk_edges: int,
) -> List[Dict[str, np.ndarray]]:
    """Per-segment host layout dicts for one scanned family.

    ``by="dst"``: dst-partitioned (forward) segments — dst local per
    segment, src ids kept verbatim (the forward's h gather space).
    ``by="src"``: src-partitioned (backward) segments — blocks over the
    LOCAL src space, stored src ids verbatim for the h gather, dst ids
    verbatim for the packed-stream gather.

    Canonical edge ids for the dropout hash must be partition-independent
    (the two families walk different edge orders): positions in the
    caller's edge list, or ``eid``'s values when given (the halo path's
    per-shard canonical ids)."""
    key_arr = dst if by == "dst" else src
    shard_of = np.minimum(key_arr // rows, num_segments - 1)
    dicts = []
    for g in range(num_segments):
        sel = shard_of == g
        sel_idx = np.nonzero(sel)[0]
        if by == "dst":
            d_loc = dst[sel] - g * rows
            d = _build_one_np(
                d_loc, src[sel], d_loc, etype[sel], rows,
                block_nodes, chunk_edges,
            )
        else:
            s_loc = src[sel] - g * rows
            d = _build_one_np(
                s_loc, src[sel], dst[sel], etype[sel], rows,
                block_nodes, chunk_edges,
            )
        if sel_idx.shape[0]:
            canon = sel_idx if eid is None else eid[sel_idx]
            d["edge_of_slot"] = canon[d["edge_of_slot"]].astype(np.int32)
        dicts.append(d)
    return dicts


def _stack_segment_dicts(
    dicts: List[Dict[str, np.ndarray]],
    rows: int,
    block_nodes: int,
    chunk_edges: int,
    keep: str,
    lead_shape: Tuple[int, ...],
) -> BlockedEdges:
    """Pad per-segment dicts to a common chunk count, stack with leading
    shape ``lead_shape`` (e.g. ``(S,)`` or ``(G, S)``), build chunk_meta on
    device."""
    cmax = max(d["chunk_block"].shape[0] for d in dicts)
    emax = max(1, max(d["slot_of_edge"].shape[0] for d in dicts))
    dicts = [_pad_np(d, cmax, chunk_edges, emax) for d in dicts]
    st = {k: np.stack([d[k] for d in dicts]) for k in dicts[0]}
    n_stk, slots = st["etype"].shape
    c = slots // chunk_edges
    meta = _chunk_meta_device(
        jnp.asarray(st["etype"]).reshape(n_stk * slots),
        jnp.asarray(st["local_seg"]).reshape(n_stk * slots),
        jnp.asarray(st["mask"]).reshape(n_stk * slots),
        jnp.asarray(st["edge_of_slot"]).reshape(n_stk * slots),
        chunk_edges,
    ).reshape(*lead_shape, c, 8, chunk_edges)

    def shaped(a):
        return jnp.asarray(a).reshape(*lead_shape, *a.shape[1:])

    return BlockedEdges(
        src=shaped(st["src"]) if keep == "src" else None,
        dst=shaped(st["dst"]) if keep == "dst" else None,
        chunk_block=shaped(st["chunk_block"]),
        block_nonempty=shaped(st["block_nonempty"]),
        chunk_meta=meta,
        block_nodes=int(block_nodes),
        chunk_edges=int(chunk_edges),
        num_blocks=rows // block_nodes,
    )


def build_scanned_graph(
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    num_nodes: int,
    num_segments: int,
    *,
    block_nodes: int = 128,
    chunk_edges: int = 256,
) -> ScannedBlockedGraph:
    """Host-side build of the dst-/src-partitioned segment stacks.
    ``num_nodes`` is the padded node count; only REAL edges go in."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    etype = np.asarray(etype, np.int64)
    s = int(num_segments)

    rows = -(-(-(-num_nodes // s)) // block_nodes) * block_nodes

    by_dst = _stack_segment_dicts(
        _scanned_family_np(
            src, dst, etype, None, rows, s, "dst", block_nodes, chunk_edges
        ),
        rows, block_nodes, chunk_edges, "src", (s,),
    )
    by_src = _stack_segment_dicts(
        _scanned_family_np(
            src, dst, etype, None, rows, s, "src", block_nodes, chunk_edges
        ),
        rows, block_nodes, chunk_edges, "dst", (s,),
    )
    return ScannedBlockedGraph(
        by_dst=by_dst,
        by_src=by_src,
        num_shards=s,
        rows_dst=rows,
        rows_src=rows,
        num_nodes=int(num_nodes),
    )


def build_scanned_shards(
    per_shard_edges: Sequence[Tuple[np.ndarray, ...]],
    dst_space: int,
    src_space: int,
    num_segments: int,
    *,
    block_nodes: int = 128,
    chunk_edges: int = 256,
) -> ScannedBlockedGraph:
    """Scanned segment stacks for EVERY graph shard, stacked ``[G, S, ...]``
    — the composition of ``build_blocked_shards`` (per-device layouts
    consumed inside ``shard_map``) with ``build_scanned_graph`` (per-device
    ``lax.scan`` over segments). Each device slices its ``[S, ...]``
    leaves and runs the memory-bounded scanned propagate on its shard, so
    halo-sharded graphs whose PER-SHARD edge count still exceeds the
    single-shot backward's memory envelope (~3·E·H·F·4 bytes of gather
    streams) can train (SURVEY §7.3 item 3 at multi-chip scale).

    ``per_shard_edges``: per shard ``(src, dst, etype[, canonical_eid])``
    with dst in the LOCAL output space ``[0, dst_space)`` and src in the
    shared gather space ``[0, src_space)`` (halo-buffer ids for the halo
    path). Canonical ids default to position in the shard's edge list —
    the same ids the unsplit halo layout hashes, so dropout masks replay
    identically whether or not a shard scans."""
    s = int(num_segments)
    rows_d = -(-(-(-int(dst_space) // s)) // block_nodes) * block_nodes
    rows_s = -(-(-(-int(src_space) // s)) // block_nodes) * block_nodes

    dst_dicts: List[Dict[str, np.ndarray]] = []
    src_dicts: List[Dict[str, np.ndarray]] = []
    for tup in per_shard_edges:
        src_a, dst_a, et_a = (np.asarray(x, np.int64) for x in tup[:3])
        eid = np.asarray(tup[3], np.int64) if len(tup) > 3 else None
        dst_dicts += _scanned_family_np(
            src_a, dst_a, et_a, eid, rows_d, s, "dst", block_nodes,
            chunk_edges,
        )
        src_dicts += _scanned_family_np(
            src_a, dst_a, et_a, eid, rows_s, s, "src", block_nodes,
            chunk_edges,
        )

    g = len(per_shard_edges)
    return ScannedBlockedGraph(
        by_dst=_stack_segment_dicts(
            dst_dicts, rows_d, block_nodes, chunk_edges, "src", (g, s)
        ),
        by_src=_stack_segment_dicts(
            src_dicts, rows_s, block_nodes, chunk_edges, "dst", (g, s)
        ),
        num_shards=s,
        rows_dst=rows_d,
        rows_src=rows_s,
        num_nodes=int(dst_space),
    )


def build_blocked_graph(
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    num_nodes: int,
    *,
    block_nodes: int = 128,
    chunk_edges: int = 256,
) -> BlockedGraph:
    """``num_nodes`` must already be the padded node count; only REAL edges
    should be passed (the blocked layouts make their own padding)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    etype = np.asarray(etype, np.int64)
    d_dst = _build_one_np(
        dst, src, dst, etype, num_nodes, block_nodes, chunk_edges
    )
    d_src = _build_one_np(
        src, src, dst, etype, num_nodes, block_nodes, chunk_edges
    )
    return BlockedGraph(
        by_dst=_to_blocked_edges(
            d_dst, num_nodes, block_nodes, chunk_edges, "src"
        ),
        by_src=_to_blocked_edges(
            d_src, num_nodes, block_nodes, chunk_edges, "dst"
        ),
        num_nodes=int(num_nodes),
    )
