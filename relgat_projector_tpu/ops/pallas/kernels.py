"""Custom-VJP orchestration of the fused Pallas RelGAT kernels.

TPU-native replacement for the reference's torch-scatter CUDA primitives
(``core/model/layer.py:284-316``). The kernels themselves live in
``ops/pallas/fused.py`` (single-pass forward with online segment softmax;
flash-style hand-written backward; masked blocked scatter-sum). This module
wires them into a jit/pjit-composable ``custom_vjp`` over the block-padded
edge layout (``data/blocked.py``) and provides the dispatch entry point
``relgat_propagate_pallas``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from relgat_projector_tpu.data.blocked import BlockedEdges, BlockedGraph
from relgat_projector_tpu.ops.segment import STABLE_SOFTMAX_EPS


def _gather_ps(h, src, heads, f, dtype=jnp.float32):
    """Row-major source gather (axis-0 take is ~4x faster than axis-1);
    returns the 2D ``[E_bp, H*F]`` layout the kernels stream. Casting the
    node-sized array BEFORE the edge-sized gather halves the gather's
    write traffic when ``dtype`` is bf16. ``mode="clip"``: the blocked
    layout guarantees every slot (incl. padding, which repeats a real
    edge's src) is in bounds, and take's default fill mode costs a
    measured ~2x on this [E, H*F] gather (clamp+select pass over the
    gathered rows, scripts/tpu_gather_probe.py)."""
    n_pad = h.shape[0]
    return jnp.take(
        h.reshape(n_pad, heads * f).astype(dtype), src, axis=0, mode="clip"
    )


def _stream_dtype(precision):
    """Per-edge gather streams ride bf16 in "default" (1-pass bf16 MXU)
    mode: the kernels' dominant HBM traffic halves, and the MXU consumes
    bf16 operands natively at that precision. Exact tiers keep fp32."""
    return (
        jnp.bfloat16
        if precision == jax.lax.Precision.DEFAULT
        else jnp.float32
    )


def _zero_cotangent(tree):
    """float0 cotangents for the non-differentiable blocked-layout arrays."""
    import numpy as np

    def one(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    return jax.tree_util.tree_map(one, tree)


def _segment_fwd(
    h, attn_bank, rel_bias, be, num_out, seed,
    *, use_bias, negative_slope, eps, attn_dropout_rate, precision,
):
    """Forward over ONE blocked layout ``be`` (dst space = ``num_out``
    rows, sources gathered from the full ``h``).
    Returns ``(out [num_out, H, F], out_blocks, stats)``."""
    from relgat_projector_tpu.ops.pallas.fused import fused_relgat_forward

    heads, num_rel, f = attn_bank.shape
    td = be.block_nodes

    ps = _gather_ps(h, be.src, heads, f, _stream_dtype(precision))
    out_blocks, stats = fused_relgat_forward(
        ps, be, attn_bank.astype(jnp.float32),
        rel_bias if use_bias else None,
        negative_slope=negative_slope, eps=eps, with_stats=True,
        attn_dropout_rate=attn_dropout_rate, dropout_seed=seed,
        precision=precision,
    )
    agg = out_blocks[:num_out]
    # Blocks with no edges are never written -> garbage; select to zero.
    node_mask = jnp.repeat(be.block_nonempty, td)[:num_out]
    out = jnp.where(node_mask[:, None] > 0, agg, 0.0)
    out = out.reshape(num_out, heads, f)
    return out, out_blocks, stats


def _packed_stream(g, out_blocks, stats, heads, f,
                   precision=jax.lax.Precision.HIGHEST):
    """Per-dst-node backward statistics packed into ONE wide matrix
    ``[N_out, HF + 8H]``: g rows, then m, l, S = <out - bias, g>, gsum.
    One wide per-edge gather of this beats separate narrow-row stat
    gathers, which are pathologically slow on TPU; the kernel slices the
    columns per chunk in VMEM.

    In "default" (bf16) mode the matrix rides bf16 — HALF the HBM bytes of
    the backward's largest node-sized array AND of its per-edge gather —
    with the softmax statistics stored as bf16 (hi, lo) PAIRS the kernel
    recombines to fp32-grade values: plain bf16 stats measured ~13% dh
    error (m shifts the exponent, S enters the cancellation-prone
    ``de = alpha * (dalpha - S)``), while hi+lo carries ~16 mantissa bits.
    Same [N_out, HF + 8H] width either way; dtype + stat-column layout
    differ (pairs need 6H+2 <= 8H stat columns)."""
    n_out = g.shape[0]
    hf = heads * f
    g2 = g.astype(jnp.float32).reshape(n_out, hf)
    out2 = out_blocks[:n_out]
    # stats is the kernels' dense [N, 128] lane layout: m | l | bias.
    bias_n = stats[:n_out, 2 * heads]                  # [N_out]
    m_n = stats[:n_out, 0:heads]                       # [N_out, H]
    l_n = stats[:n_out, heads:2 * heads]               # [N_out, H]
    s_nh = jnp.sum(
        ((out2 - bias_n[:, None]) * g2).reshape(n_out, heads, f), axis=2
    )                                                  # [N_out, H]
    gsum = jnp.sum(g2, axis=1)[:, None]                # [N_out, 1]
    if _stream_dtype(precision) != jnp.bfloat16:
        return jnp.concatenate(
            [
                g2,
                m_n,
                l_n,
                s_nh,
                gsum,
                jnp.zeros((n_out, 5 * heads - 1), jnp.float32),
            ],
            axis=1,
        )

    def pair(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    m_hi, m_lo = pair(m_n)
    l_hi, l_lo = pair(l_n)
    s_hi, s_lo = pair(s_nh)
    gs_hi, gs_lo = pair(gsum)
    return jnp.concatenate(
        [
            g2.astype(jnp.bfloat16),
            m_hi, m_lo, l_hi, l_lo, s_hi, s_lo, gs_hi, gs_lo,
            jnp.zeros((n_out, 2 * heads - 2), jnp.bfloat16),
        ],
        axis=1,
    )


def _bwd_from_packed(
    h, attn_bank, packed, bs, seed,
    *, use_bias, negative_slope, eps, attn_dropout_rate, precision,
    chunk_block_h=None, src_rows_total=None,
):
    """Backward over ONE src-blocked layout ``bs`` given the packed per-dst
    stream (``bs.dst`` indexes it). Returns ``(dh_blocks [NB*TD, H*F]
    — the src-block space of ``bs``, masked; dattn, dbias)``.

    The source features are NOT gathered to edge size: every src-blocked
    chunk reads one [TD, H*F] block of ``h``, which the kernel loads by
    block index and row-selects in-kernel (one-hot MXU) — removing the
    [E_bp, H*F] ps_src gather and its HBM stream entirely. ``h`` only
    needs padding to whole blocks (``src_rows_total`` overrides for the
    scanned path, whose segment-local block ids index into global ``h``
    via ``chunk_block_h``)."""
    from relgat_projector_tpu.ops.pallas.fused import (
        fused_relgat_backward_src,
    )

    heads, num_rel, f = attn_bank.shape
    td = bs.block_nodes
    # Exact modes gather the fp32 packed stream; "default" mode gathers a
    # bf16 one whose softmax stats ride as (hi, lo) pairs — plain bf16
    # stats measured ~13% dh error (m shifts the exponent, S enters the
    # cancellation-prone de = alpha * (dalpha - S)); the pair recombination
    # keeps fp32-grade stats at half the gather bytes (_packed_stream).
    ge_all = jnp.take(packed, bs.dst, axis=0, mode="clip")
    n_src = h.shape[0]
    hb = h.reshape(n_src, heads * f).astype(_stream_dtype(precision))
    rows_needed = (
        src_rows_total if src_rows_total is not None
        else bs.num_blocks * td
    )
    if rows_needed > n_src:
        hb = jnp.pad(hb, ((0, rows_needed - n_src), (0, 0)))
    dh_blocks, dattn, dbias = fused_relgat_backward_src(
        hb, ge_all, bs, attn_bank,
        chunk_block_h=chunk_block_h,
        negative_slope=negative_slope, eps=eps,
        attn_dropout_rate=attn_dropout_rate, dropout_seed=seed,
        precision=precision,
    )
    n_rows = dh_blocks.shape[0]
    src_mask = jnp.repeat(bs.block_nonempty, td)[:n_rows]
    dh_blocks = jnp.where(src_mask[:, None] > 0, dh_blocks, 0.0)
    return dh_blocks, dattn, dbias


def _segment_bwd(
    h, attn_bank, g, out_blocks, stats, blocked, seed,
    *, use_bias, negative_slope, eps, attn_dropout_rate, precision,
):
    """Backward over ONE blocked segment/shard. ``g`` covers the segment's
    dst rows; the returned ``dh`` covers the FULL source space of ``h``
    (a partial — callers sum across segments/shards).

    The destination (output) node space and the source (input) node space
    are distinct: identical for the single-shot single-device propagate,
    but a mesh shard owns a LOCAL dst range while gathering sources from
    the shared space."""
    heads, num_rel, f = attn_bank.shape
    n_pad = h.shape[0]
    cfg = dict(
        use_bias=use_bias, negative_slope=negative_slope, eps=eps,
        attn_dropout_rate=attn_dropout_rate, precision=precision,
    )
    packed = _packed_stream(
        g, out_blocks, stats, heads, f, precision=precision
    )
    dh_blocks, dattn, dbias = _bwd_from_packed(
        h, attn_bank, packed, blocked.by_src, seed, **cfg
    )
    dh = dh_blocks[:n_pad].reshape(n_pad, heads, f).astype(h.dtype)
    return dh, dattn, dbias


def _make_propagate(
    use_bias: bool, negative_slope: float, eps: float, precision,
    attn_dropout_rate: float = 0.0,
):
    """Build the custom-VJP propagate for a given static configuration.

    The blocked layout rides through as a regular pytree argument (its
    arrays may be tracers under jit; its shape metadata is static), so this
    composes with jit/pjit — ``nondiff_argnums`` must not hold arrays.
    ``seed`` is the int32 attention-dropout hash seed (``ops/dropout.py``);
    the backward replays the identical mask from it.
    """
    cfg = dict(
        use_bias=use_bias, negative_slope=negative_slope, eps=eps,
        attn_dropout_rate=attn_dropout_rate, precision=precision,
    )

    @jax.custom_vjp
    def prop(h, attn_bank, rel_bias, blocked, seed):
        out, _, _ = _segment_fwd(
            h, attn_bank, rel_bias, blocked.by_dst, blocked.num_nodes,
            seed, **cfg,
        )
        return out

    def _vjp_fwd(h, attn_bank, rel_bias, blocked, seed):
        out, out_blocks, stats = _segment_fwd(
            h, attn_bank, rel_bias, blocked.by_dst, blocked.num_nodes,
            seed, **cfg,
        )
        return out, (h, attn_bank, rel_bias, out_blocks, stats, seed,
                     blocked)

    def _vjp_bwd(residuals, g):
        h, attn_bank, rel_bias, out_blocks, stats, seed, blocked = residuals
        dh, dattn, dbias = _segment_bwd(
            h, attn_bank, g, out_blocks, stats, blocked, seed, **cfg
        )
        drel = dbias if use_bias else jnp.zeros_like(rel_bias)
        return (
            dh,
            dattn.astype(attn_bank.dtype),
            drel,
            _zero_cotangent(blocked),
            _zero_cotangent(seed),
        )

    prop.defvjp(_vjp_fwd, _vjp_bwd)
    return prop


_NEG = float(-1e30)  # fused-kernel "no edge yet" max sentinel


def _unpack_block_partials(out_blocks, stats, nonempty, heads, f, eps):
    """Recover flash-merge state ``(m, l, bias, acc)`` from one fused
    forward's outputs. Rows of edge-less blocks are unwritten garbage —
    masked to the neutral element (m = -1e30, l = 0, acc = 0, bias = 0).
    ``acc`` un-normalizes with the kernel's own denominator convention
    (``max(l, eps)``), so rows a subset never touched recover exactly 0."""
    ne = nonempty
    m = jnp.where(ne[:, None] > 0, stats[:, 0:heads], _NEG)        # [N, H]
    l = jnp.where(ne[:, None] > 0, stats[:, heads:2 * heads], 0.0)  # [N, H]
    b = jnp.where(ne > 0, stats[:, 2 * heads], 0.0)                 # [N]
    out = jnp.where(ne[:, None] > 0, out_blocks, 0.0)      # [N, H*F]
    denom = jnp.repeat(jnp.maximum(l, eps), f, axis=1)     # [N, H*F]
    acc = (out - b[:, None]) * denom
    return m, l, b, acc


def _merge_block_partials(parts, heads, f, eps):
    """Flash-style merge of per-subset ``(m, l, bias, acc)`` into merged
    ``(out_blocks [N, H*F], stats [N, 128])`` in the fused kernels' own
    dense stats-lane format, so the src-blocked backward runs per subset
    against the MERGED statistics (each edge's alpha is recomputed from
    the global (m, l) — the gradient decomposes additively over
    subsets)."""
    m = parts[0][0]
    for p in parts[1:]:
        m = jnp.maximum(m, p[0])
    m_fin = jnp.where(m <= _NEG * 0.5, 0.0, m)
    l_tot, b_tot, acc_tot = None, None, None
    for m_p, l_p, b_p, acc_p in parts:
        s = jnp.where(m_p <= _NEG * 0.5, 0.0, jnp.exp(m_p - m_fin))
        l_c = l_p * s
        acc_c = acc_p * jnp.repeat(s, f, axis=1)
        l_tot = l_c if l_tot is None else l_tot + l_c
        acc_tot = acc_c if acc_tot is None else acc_tot + acc_c
        b_tot = b_p if b_tot is None else b_tot + b_p
    out = acc_tot / jnp.repeat(
        jnp.maximum(l_tot, eps), f, axis=1
    ) + b_tot[:, None]
    n = out.shape[0]
    stats = jnp.concatenate(
        [
            m,
            l_tot,
            b_tot[:, None],
            jnp.zeros((n, 128 - 2 * heads - 1), jnp.float32),
        ],
        axis=1,
    )
    return out, stats


def _make_overlapped_propagate(
    use_bias: bool, negative_slope: float, eps: float, precision,
    attn_dropout_rate: float = 0.0,
):
    """Custom-VJP propagate over TWO disjoint edge subsets of the same
    destination rows with SEPARATE gather spaces — the fused-kernel side
    of the overlapped halo exchange (``parallel/halo.py``).

    The local subset gathers from ``h_own`` (this shard's rows) and the
    remote subset from the received halo buffer, so the boundary
    ``all_to_all`` (outside this function) has no data dependence on the
    local subset's forward — XLA's scheduler can overlap it with the
    local aggregation. Outputs merge flash-style; the backward runs the
    src-blocked kernel once per subset against the merged statistics and
    returns separate ``(dh_own, dhalo)`` cotangents (the exchange's AD
    transpose routes ``dhalo`` back to its owners)."""
    cfg = dict(
        use_bias=use_bias, negative_slope=negative_slope, eps=eps,
        attn_dropout_rate=attn_dropout_rate, precision=precision,
    )

    def _fwd_parts(h_own, halo, attn_bank, rel_bias, bl_loc, bl_rem, seed):
        heads, _, f = attn_bank.shape
        rows = h_own.shape[0]
        td = bl_loc.by_dst.block_nodes

        def one(h_src, bl):
            _, out_blocks, stats = _segment_fwd(
                h_src, attn_bank, rel_bias, bl.by_dst, rows, seed, **cfg,
            )
            ne = jnp.repeat(bl.by_dst.block_nonempty, td)
            return _unpack_block_partials(
                out_blocks, stats, ne, heads, f, eps
            ), ne

        p_loc, ne_l = one(h_own, bl_loc)
        p_rem, ne_r = one(halo, bl_rem)
        outb, stats = _merge_block_partials([p_loc, p_rem], heads, f, eps)
        ne_any = jnp.maximum(ne_l, ne_r)
        out = jnp.where(ne_any[:rows, None] > 0, outb[:rows], 0.0)
        return out.reshape(rows, heads, f), outb, stats

    @jax.custom_vjp
    def prop(h_own, halo, attn_bank, rel_bias, bl_loc, bl_rem, seed):
        out, _, _ = _fwd_parts(
            h_own, halo, attn_bank, rel_bias, bl_loc, bl_rem, seed
        )
        return out

    def _vjp_fwd(h_own, halo, attn_bank, rel_bias, bl_loc, bl_rem, seed):
        out, outb, stats = _fwd_parts(
            h_own, halo, attn_bank, rel_bias, bl_loc, bl_rem, seed
        )
        return out, (
            h_own, halo, attn_bank, rel_bias, outb, stats, seed,
            bl_loc, bl_rem,
        )

    def _vjp_bwd(residuals, g):
        (h_own, halo, attn_bank, rel_bias, outb, stats, seed,
         bl_loc, bl_rem) = residuals
        heads, num_rel, f = attn_bank.shape
        packed = _packed_stream(
            g.astype(jnp.float32), outb, stats, heads, f,
            precision=cfg["precision"],
        )
        dh_own_b, dattn_a, dbias_a = _bwd_from_packed(
            h_own, attn_bank, packed, bl_loc.by_src, seed, **cfg
        )
        dhalo_b, dattn_b, dbias_b = _bwd_from_packed(
            halo, attn_bank, packed, bl_rem.by_src, seed, **cfg
        )
        dh_own = (
            dh_own_b[: h_own.shape[0]]
            .reshape(h_own.shape)
            .astype(h_own.dtype)
        )
        dhalo = (
            dhalo_b[: halo.shape[0]].reshape(halo.shape).astype(halo.dtype)
        )
        dattn = (dattn_a + dattn_b).astype(attn_bank.dtype)
        drel = (
            (dbias_a + dbias_b) if use_bias else jnp.zeros_like(rel_bias)
        )
        return (
            dh_own, dhalo, dattn, drel,
            _zero_cotangent(bl_loc), _zero_cotangent(bl_rem),
            _zero_cotangent(seed),
        )

    prop.defvjp(_vjp_fwd, _vjp_bwd)
    return prop


@functools.lru_cache(maxsize=None)
def _cached_overlapped_propagate(
    use_bias: bool, negative_slope: float, eps: float, precision: str,
    attn_dropout_rate: float = 0.0,
):
    return _make_overlapped_propagate(
        use_bias, float(negative_slope), float(eps),
        _PRECISIONS[precision], attn_dropout_rate,
    )


def relgat_propagate_pallas_overlapped(
    h_own: jax.Array,          # [rows, H, F] this shard's feature rows
    halo: jax.Array,           # [G*Hp, H, F] received boundary rows
    attn_bank: jax.Array,
    rel_bias: Optional[jax.Array],
    bl_loc: BlockedGraph,      # local-src edges (src space = rows)
    bl_rem: BlockedGraph,      # remote-src edges (src space = G*Hp)
    *,
    negative_slope: float = 0.2,
    eps: float = STABLE_SOFTMAX_EPS,
    attn_dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    kernel_precision: str = "highest",
) -> jax.Array:
    """Fused-kernel propagate for the overlapped halo exchange: local and
    remote edge subsets aggregate separately (local needs only ``h_own``,
    so it can hide the boundary ``all_to_all``) and merge flash-style."""
    use_dropout = attn_dropout_rate > 0.0 and dropout_rng is not None
    use_bias = rel_bias is not None
    prop = _cached_overlapped_propagate(
        use_bias, float(negative_slope), float(eps), kernel_precision,
        float(attn_dropout_rate) if use_dropout else 0.0,
    )
    num_rel = attn_bank.shape[1]
    bias_arg = rel_bias if use_bias else jnp.zeros((num_rel,), jnp.float32)
    if use_dropout:
        from relgat_projector_tpu.ops.dropout import seed_from_key

        seed = seed_from_key(dropout_rng)
    else:
        seed = jnp.int32(0)
    return prop(h_own, halo, attn_bank, bias_arg, bl_loc, bl_rem, seed)


def _make_scanned_propagate(
    use_bias: bool, negative_slope: float, eps: float, precision,
    attn_dropout_rate: float = 0.0,
):
    """Segment-SCANNED propagate over a ``ScannedBlockedGraph``
    (``data/blocked.build_scanned_graph``) so only one segment's
    ``[E_seg, ...]`` gather streams are live at a time.

    This is what makes >4M-edge graphs fit one chip: the single-shot
    backward keeps ~3 E-sized per-edge streams in HBM simultaneously
    (measured 21 GB at 8M edges x H*F=64 on a 16 GB v5e). The forward
    scans DST-range segments (outputs concatenate); the backward scans
    SRC-range segments against the node-sized packed g/stats stream, so
    per-segment dh rows concatenate too (dattn/dbias accumulate). Same
    kernels, same math; dropout masks hash GLOBAL canonical edge ids so
    both partitions replay identically."""
    cfg = dict(
        use_bias=use_bias, negative_slope=negative_slope, eps=eps,
        attn_dropout_rate=attn_dropout_rate, precision=precision,
    )

    @jax.custom_vjp
    def prop(h, attn_bank, rel_bias, sbg, seed):
        out, _ = _fwd(h, attn_bank, rel_bias, sbg, seed)
        return out

    def _fwd(h, attn_bank, rel_bias, sbg, seed):
        s = sbg.num_shards
        heads, _, f = attn_bank.shape

        def seg(_, be_i):
            out, out_blocks, stats = _segment_fwd(
                h, attn_bank, rel_bias, be_i, sbg.rows_dst, seed, **cfg,
            )
            return None, (out, out_blocks, stats)

        _, (outs, outb, stats) = jax.lax.scan(seg, None, sbg.by_dst)
        out = outs.reshape(s * sbg.rows_dst, heads, f)
        return out[: sbg.num_nodes], (outb, stats)

    def _vjp_fwd(h, attn_bank, rel_bias, sbg, seed):
        out, (outb, stats) = _fwd(h, attn_bank, rel_bias, sbg, seed)
        return out, (h, attn_bank, rel_bias, outb, stats, seed, sbg)

    def _vjp_bwd(residuals, g):
        h, attn_bank, rel_bias, outb, stats, seed, sbg = residuals
        s, rows_d = sbg.num_shards, sbg.rows_dst
        heads, num_rel, f = attn_bank.shape
        hf = heads * f

        # Node-sized GLOBAL packed stream (dst rows tile contiguously
        # across the dst segments: segment s holds rows [s*rows_d, ...)).
        g2 = g.astype(jnp.float32)
        pad = s * rows_d - g2.shape[0]
        if pad:
            g2 = jnp.pad(g2, ((0, pad), (0, 0), (0, 0)))
        packed = _packed_stream(
            g2,
            outb.reshape(s * rows_d, hf),
            stats.reshape(s * rows_d, 128),
            heads,
            f,
            precision=cfg["precision"],
        )

        rows_s = sbg.rows_src
        blocks_per_seg = rows_s // sbg.by_src.block_nodes
        offsets = jnp.arange(s, dtype=jnp.int32) * blocks_per_seg

        def seg(carry, xs):
            bs_i, off_i = xs
            dattn_acc, dbias_acc = carry
            # Segment block ids are LOCAL; the kernel's h input indexes the
            # GLOBAL feature rows, so offset by the segment's block base.
            dh_blocks, dattn, dbias = _bwd_from_packed(
                h, attn_bank, packed, bs_i, seed,
                chunk_block_h=bs_i.chunk_block + off_i,
                src_rows_total=s * rows_s,
                **cfg,
            )
            return (dattn_acc + dattn, dbias_acc + dbias), dh_blocks

        init = (
            jnp.zeros((heads, num_rel, f), jnp.float32),
            jnp.zeros((num_rel,), jnp.float32),
        )
        (dattn, dbias), dh_segs = jax.lax.scan(
            seg, init, (sbg.by_src, offsets)
        )
        # Src segments own disjoint contiguous row ranges: concatenate.
        dh = dh_segs.reshape(s * sbg.rows_src, heads, f)[: h.shape[0]]
        drel = dbias if use_bias else jnp.zeros_like(rel_bias)
        return (
            dh.astype(h.dtype),
            dattn.astype(attn_bank.dtype),
            drel,
            _zero_cotangent(sbg),
            _zero_cotangent(seed),
        )

    prop.defvjp(_vjp_fwd, _vjp_bwd)
    return prop


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    # Mosaic's dot lowering supports only DEFAULT and HIGHEST; "high" maps
    # to the exact tier.
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}


@functools.lru_cache(maxsize=None)
def _cached_propagate(
    use_bias: bool, negative_slope: float, eps: float, precision: str,
    attn_dropout_rate: float = 0.0,
):
    return _make_propagate(
        use_bias, negative_slope, eps, _PRECISIONS[precision],
        attn_dropout_rate,
    )


@functools.lru_cache(maxsize=None)
def _cached_scanned_propagate(
    use_bias: bool, negative_slope: float, eps: float, precision: str,
    attn_dropout_rate: float = 0.0,
):
    return _make_scanned_propagate(
        use_bias, negative_slope, eps, _PRECISIONS[precision],
        attn_dropout_rate,
    )


def relgat_propagate_pallas_scanned(
    h: jax.Array,
    attn_bank: jax.Array,
    rel_bias: Optional[jax.Array],
    sbg,  # ShardedBlockedGraph (mesh-less: segments scanned on ONE device)
    *,
    negative_slope: float = 0.2,
    eps: float = STABLE_SOFTMAX_EPS,
    attn_dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    kernel_precision: str = "highest",
) -> jax.Array:
    """Memory-bounded propagate for huge single-chip graphs: scans the
    fused kernels over per-segment blocked layouts so only E/S edges of
    gather streams are resident (see ``_make_scanned_propagate``)."""
    use_dropout = attn_dropout_rate > 0.0 and dropout_rng is not None
    use_bias = rel_bias is not None
    prop = _cached_scanned_propagate(
        use_bias, float(negative_slope), float(eps), kernel_precision,
        float(attn_dropout_rate) if use_dropout else 0.0,
    )
    num_rel = attn_bank.shape[1]
    bias_arg = (
        rel_bias if use_bias else jnp.zeros((num_rel,), jnp.float32)
    )
    if use_dropout:
        from relgat_projector_tpu.ops.dropout import seed_from_key

        seed = seed_from_key(dropout_rng)
    else:
        seed = jnp.int32(0)
    return prop(h, attn_bank, bias_arg, sbg, seed)


def relgat_propagate_pallas(
    h: jax.Array,
    attn_bank: jax.Array,
    rel_bias: Optional[jax.Array],
    blocked: BlockedGraph,
    *,
    negative_slope: float = 0.2,
    eps: float = STABLE_SOFTMAX_EPS,
    attn_dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    kernel_precision: str = "highest",
) -> jax.Array:
    """Drop-in replacement for the XLA ``relgat_propagate`` using the fused
    Pallas kernels over the block-padded layout. ``kernel_precision``:
    "highest" (fp32-exact, reference parity), "high" (alias of "highest" —
    Mosaic's dot lowering exposes no intermediate bf16x3 tier) or
    "default": 1-pass bf16 MXU AND bf16 source-feature gather streams
    (~8e-3 fwd / ~8e-2 max dh vs fp32 — consistent with a bf16-rounded-
    input fp32 oracle to ~2e-3; convergence-checked end-to-end).

    Attention dropout stays IN the fused kernels: the mask hashes
    ``(seed, canonical edge id, head)`` (``ops/dropout.py``) so the
    src-blocked backward replays it bit-exactly — the same mask the XLA
    path derives for the same key, making the paths comparable."""
    use_dropout = attn_dropout_rate > 0.0 and dropout_rng is not None
    use_bias = rel_bias is not None
    prop = _cached_propagate(
        use_bias, float(negative_slope), float(eps), kernel_precision,
        float(attn_dropout_rate) if use_dropout else 0.0,
    )
    num_rel = attn_bank.shape[1]
    bias_arg = (
        rel_bias if use_bias else jnp.zeros((num_rel,), jnp.float32)
    )
    if use_dropout:
        from relgat_projector_tpu.ops.dropout import seed_from_key

        seed = seed_from_key(dropout_rng)
    else:
        seed = jnp.int32(0)
    return prop(h, attn_bank, bias_arg, blocked, seed)
