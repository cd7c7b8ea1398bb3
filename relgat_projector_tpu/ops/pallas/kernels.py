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


def _xla_reference(
    h, attn_bank, rel_bias, be: BlockedEdges, num_nodes,
    *, negative_slope, eps, attn_dropout_rate=0.0, dropout_rng=None,
):
    """XLA propagate on the blocked arrays (identical math, identical
    hash-derived dropout masks via ``be.edge_of_slot``) — the validation
    oracle for the fused kernels."""
    from relgat_projector_tpu.ops.relgat_ops import relgat_propagate

    return relgat_propagate(
        h, attn_bank, rel_bias, be.src, be.dst, be.etype,
        num_nodes=num_nodes,
        negative_slope=negative_slope,
        eps=eps,
        attn_dropout_rate=attn_dropout_rate,
        dropout_rng=dropout_rng,
        edges_sorted_by_dst=True,
        edge_mask=be.mask,
        use_pallas=False,
        dropout_edge_ids=be.edge_of_slot,
    )


def _gather_ps(h, src, heads, f):
    """Row-major source gather (axis-0 take is ~4x faster than axis-1);
    returns the 2D ``[E_bp, H*F]`` layout the kernels stream."""
    n_pad = h.shape[0]
    return jnp.take(h.reshape(n_pad, heads * f), src, axis=0)


def _zero_cotangent(tree):
    """float0 cotangents for the non-differentiable blocked-layout arrays."""
    import numpy as np

    def one(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    return jax.tree_util.tree_map(one, tree)


def _segment_fwd(
    h, attn_bank, rel_bias, blocked, seed,
    *, use_bias, negative_slope, eps, attn_dropout_rate, precision,
):
    """Forward over ONE blocked segment/shard (dst space =
    ``blocked.num_nodes`` rows, sources gathered from the full ``h``).
    Returns ``(out [rows, H, F], out_blocks, stats)``."""
    from relgat_projector_tpu.ops.pallas.fused import fused_relgat_forward

    be = blocked.by_dst
    num_nodes = blocked.num_nodes
    heads, num_rel, f = attn_bank.shape
    td = be.block_nodes

    ps = _gather_ps(h, be.src, heads, f)
    out_blocks, stats = fused_relgat_forward(
        ps, be, attn_bank.astype(jnp.float32),
        rel_bias if use_bias else None,
        negative_slope=negative_slope, eps=eps, with_stats=True,
        attn_dropout_rate=attn_dropout_rate, dropout_seed=seed,
        precision=precision,
    )
    agg = out_blocks[:num_nodes]
    # Blocks with no edges are never written -> garbage; select to zero.
    node_mask = jnp.repeat(be.block_nonempty, td)[:num_nodes]
    out = jnp.where(node_mask[:, None] > 0, agg, 0.0)
    out = out.reshape(num_nodes, heads, f)
    return out, out_blocks, stats


def _segment_bwd(
    h, attn_bank, g, out_blocks, stats, blocked, seed,
    *, use_bias, negative_slope, eps, attn_dropout_rate, precision,
):
    """Backward over ONE blocked segment/shard. ``g`` covers the segment's
    dst rows; the returned ``dh`` covers the FULL source space of ``h``
    (a partial — callers sum across segments/shards).

    The destination (output) node space and the source (input) node space
    are distinct: identical for the single-shot single-device propagate,
    but a mesh shard or scan segment owns a LOCAL dst range while gathering
    sources from the shared space."""
    from relgat_projector_tpu.ops.pallas.fused import (
        fused_relgat_backward_src,
    )

    bs = blocked.by_src
    heads, num_rel, f = attn_bank.shape
    td = bs.block_nodes
    n_out = g.shape[0]
    n_pad = h.shape[0]
    hf = heads * f

    # Per-node backward statistics (tiny XLA work on [N, ...] arrays):
    # block rows tile nodes contiguously, so node n is stats row n.
    g2 = g.astype(jnp.float32).reshape(n_out, hf)
    out2 = out_blocks[:n_out]
    bias_n = stats[:n_out, 2, 0]                       # [N_out]
    # Softmax-backward sum: S_{n,h} = <out_n - bias_n, g_n> per head.
    s_nh = jnp.sum(
        ((out2 - bias_n[:, None]) * g2).reshape(n_out, heads, f), axis=2
    )                                                  # [N_out, H]
    m_n = stats[:n_out, 0, :]                          # [N_out, H]
    l_n = stats[:n_out, 1, :]
    gsum_n = jnp.sum(g2, axis=1)                       # [N_out]

    # ONE wide per-edge gather: pack g rows and the per-dst stats into a
    # single [N, HF + 8H] matrix first. Separate narrow-row stat gathers
    # (16B rows) are pathologically slow on TPU. ``bs.dst`` indexes the
    # dst (output) node space.
    dsts = bs.dst
    packed = jnp.concatenate(
        [
            g2,
            m_n,
            l_n,
            s_nh,
            gsum_n[:, None],
            jnp.zeros((n_out, 5 * heads - 1), jnp.float32),
        ],
        axis=1,
    )                                                  # [N_out, HF + 8H]
    # The packed stream goes to the kernel WHOLE; it slices g/stat columns
    # per chunk in VMEM (host-side slices materialized multi-GB copies).
    ge_all = jnp.take(packed, dsts, axis=0)
    ps_src = _gather_ps(h, bs.src, heads, f)

    dh_blocks, dattn, dbias = fused_relgat_backward_src(
        ps_src, ge_all, bs, attn_bank,
        negative_slope=negative_slope, eps=eps,
        attn_dropout_rate=attn_dropout_rate, dropout_seed=seed,
        precision=precision,
    )
    src_mask = jnp.repeat(bs.block_nonempty, td)[:n_pad]
    dh = jnp.where(
        src_mask[:, None] > 0, dh_blocks[:n_pad], 0.0
    ).reshape(n_pad, heads, f).astype(h.dtype)
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
        out, _, _ = _segment_fwd(h, attn_bank, rel_bias, blocked, seed,
                                 **cfg)
        return out

    def _vjp_fwd(h, attn_bank, rel_bias, blocked, seed):
        out, out_blocks, stats = _segment_fwd(
            h, attn_bank, rel_bias, blocked, seed, **cfg
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


_SEED_STRIDE = 1000003  # per-segment dropout-seed offset (odd prime)


def _make_scanned_propagate(
    use_bias: bool, negative_slope: float, eps: float, precision,
    attn_dropout_rate: float = 0.0,
):
    """Segment-SCANNED propagate: ``lax.scan`` over stacked per-segment
    blocked layouts (``data/blocked.build_blocked_shards``) so only one
    segment's ``[E_seg, H*F]`` gather streams are live at a time.

    This is what makes >4M-edge graphs fit one chip: the single-shot
    backward keeps ~3 E-sized per-edge streams in HBM simultaneously
    (measured 21 GB at 8M edges x H*F=64 on a 16 GB v5e); scanning S
    segments divides that peak by S while dh/dattn accumulate in
    node-sized carries. Same math, same kernels, segment-local seeds for
    the dropout hash."""
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

        def seg(_, xs):
            shard, i = xs
            out, out_blocks, stats = _segment_fwd(
                h, attn_bank, rel_bias, shard,
                seed + i * _SEED_STRIDE, **cfg,
            )
            return None, (out, out_blocks, stats)

        _, (outs, outb, stats) = jax.lax.scan(
            seg, None, (sbg.shards, jnp.arange(s, dtype=jnp.int32))
        )
        out = outs.reshape(s * sbg.rows_per_shard, heads, f)
        return out[: sbg.num_nodes], (outb, stats)

    def _vjp_fwd(h, attn_bank, rel_bias, sbg, seed):
        out, (outb, stats) = _fwd(h, attn_bank, rel_bias, sbg, seed)
        return out, (h, attn_bank, rel_bias, outb, stats, seed, sbg)

    def _vjp_bwd(residuals, g):
        h, attn_bank, rel_bias, outb, stats, seed, sbg = residuals
        s, rows = sbg.num_shards, sbg.rows_per_shard
        heads, num_rel, f = attn_bank.shape

        g2 = g.astype(jnp.float32)
        pad = s * rows - g2.shape[0]
        if pad:
            g2 = jnp.pad(g2, ((0, pad), (0, 0), (0, 0)))
        g_seg = g2.reshape(s, rows, heads, f)

        def seg(carry, xs):
            dh_acc, dattn_acc, dbias_acc = carry
            shard, i, g_i, outb_i, stats_i = xs
            dh, dattn, dbias = _segment_bwd(
                h, attn_bank, g_i, outb_i, stats_i, shard,
                seed + i * _SEED_STRIDE, **cfg,
            )
            return (
                dh_acc + dh.astype(jnp.float32),
                dattn_acc + dattn,
                dbias_acc + dbias,
            ), None

        init = (
            jnp.zeros(h.shape, jnp.float32),
            jnp.zeros((heads, num_rel, f), jnp.float32),
            jnp.zeros((num_rel,), jnp.float32),
        )
        (dh, dattn, dbias), _ = jax.lax.scan(
            seg, init,
            (sbg.shards, jnp.arange(s, dtype=jnp.int32), g_seg, outb,
             stats),
        )
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
    "highest" (fp32-exact, reference parity), "high" (bf16x3, ~1e-6 rel) or
    "default" (bf16, ~4e-3 rel) MXU passes.

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
