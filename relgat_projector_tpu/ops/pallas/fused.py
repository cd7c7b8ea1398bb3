"""v2 fully-fused RelGAT forward kernel.

One sequential pass over the block-padded edge stream. Per chunk of TE edges
(all belonging to one destination block of TD nodes):

  1. SDDMM: relation-attention rows via one-hot ``[TE,R] @ [R,F]`` MXU
     matmul, per-edge logits, masked LeakyReLU;
  2. online segment softmax (flash-attention-style): running per-(dst,head)
     max ``m`` and denominator ``l`` live in VMEM scratch, rescaled as new
     chunks arrive — softmax statistics never touch HBM;
  3. aggregation: ``(onehot * p) [TD,TE] @ ps [TE,F]`` per head into a VMEM
     accumulator, normalized and written once per block;
  4. per-relation scalar bias accumulated the same way.

Numerics match the reference exactly (true per-dst max subtraction, denom
clamped at 1e-16 — ``layer.py:280-293``): online rescaling is algebraically
identical to the two-pass softmax.

Replaces: the v1 sddmm+stats+aggregate pipeline, whose XLA segment stats and
extra passes dominated runtime.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from relgat_projector_tpu.data.blocked import BlockedEdges

_NEG = float(-1e30)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fused_kernel(
    cb_ref,      # [C] int32 scalar prefetch: block id per chunk
    ps_ref,      # [TE, H, F]
    meta_ref,    # [1, 8, TE] int32 (0=etype, 1=local_dst, 2=mask)
    attn_ref,    # [H, R, F]
    bias_ref,    # [R, 128] f32 (column 0 holds rel_bias; zeros if disabled)
    seed_ref,    # [1, 1] int32 (attention-dropout seed)
    out_ref,     # [TD, H, F]
    stats_ref,   # [TD, 8, H] (row 0 = m, row 1 = l, row 2 = bias)
    m_s,         # scratch [H, TD] running max
    l_s,         # scratch [H, TD] running denominator
    acc_s,       # scratch [TD, H, F] running weighted sum
    b_s,         # scratch [8, TD] bias accumulator (row 0)
    *,
    heads: int,
    num_rel: int,
    block_nodes: int,
    negative_slope: float,
    eps: float,
    attn_dropout_rate: float,
):
    c = pl.program_id(0)
    prev = cb_ref[jnp.maximum(c - 1, 0)]
    is_first = jnp.logical_or(c == 0, cb_ref[c] != prev)

    et = meta_ref[0, 0, :]
    ld = meta_ref[0, 1, :]
    mask_i = meta_ref[0, 2, :]
    te = et.shape[0]
    td = block_nodes
    maskf = (mask_i > 0).astype(jnp.float32)             # [TE]
    hi = jax.lax.Precision.HIGHEST

    rel_ids = jax.lax.broadcasted_iota(jnp.int32, (te, num_rel), 1)
    onehot_r = (et[:, None] == rel_ids).astype(jnp.float32)   # [TE, R]
    rows = jax.lax.broadcasted_iota(jnp.int32, (td, te), 0)
    onehot_d = (rows == ld[None, :]).astype(jnp.float32)      # [TD, TE]

    # All hot intermediates stay 2D with TE or F (>= 128) in the lane dim;
    # per-head Python loop (H is small). A stacked [.., H] layout pads H up
    # to 128 lanes and wastes ~32x VPU throughput.

    @pl.when(is_first)
    def _():
        m_s[:] = jnp.full(m_s.shape, _NEG, jnp.float32)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)
        b_s[:] = jnp.zeros_like(b_s)

    if attn_dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + c)

    for h in range(heads):
        # ---- SDDMM + masked LeakyReLU -> e_h [TE] -----------------------
        rel_att = jnp.dot(
            onehot_r, attn_ref[h], preferred_element_type=jnp.float32,
            precision=hi,
        )                                                 # [TE, F]
        eraw = jnp.sum(ps_ref[:, h, :] * rel_att, axis=1)  # [TE]
        e_h = jnp.where(eraw >= 0, eraw, negative_slope * eraw)
        e_h = jnp.where(maskf > 0, e_h, _NEG)

        # ---- online softmax (per head, [TD] / [TD, TE] shapes) ----------
        m_prev = m_s[h]                                   # [TD]
        m_c = jnp.max(
            jnp.where(onehot_d > 0, e_h[None, :], _NEG), axis=1
        )                                                 # [TD]
        m_new = jnp.maximum(m_prev, m_c)
        m_safe = jnp.where(m_new <= _NEG * 0.5, 0.0, m_new)
        # exp(_NEG - _NEG) would be 1; rows that never saw an edge keep
        # l = 0 via the explicit mask multiplications below.
        scale = jnp.where(
            m_prev <= _NEG * 0.5, 0.0, jnp.exp(m_prev - m_safe)
        )                                                 # [TD]

        m_e = jnp.sum(onehot_d * m_safe[:, None], axis=0)  # [TE] gather
        p = jnp.exp(e_h - m_e) * maskf                    # [TE]
        l_new = l_s[h] * scale + jnp.sum(onehot_d * p[None, :], axis=1)
        m_s[h] = m_new
        l_s[h] = l_new

        # attention-weight dropout (reference ``layer.py:296-297``):
        # applied to normalized weights -> to p in the numerator only.
        p_acc = p
        if attn_dropout_rate > 0.0:
            bits = pltpu.prng_random_bits((8, te))        # uint32
            thresh = jnp.uint32(
                (1.0 - attn_dropout_rate) * 4294967295.0
            )
            keep = (bits[h % 8, :] < thresh).astype(jnp.float32)
            p_acc = p * keep / (1.0 - attn_dropout_rate)

        w = onehot_d * p_acc[None, :]                     # [TD, TE]
        partial = jnp.dot(
            w, ps_ref[:, h, :], preferred_element_type=jnp.float32,
            precision=hi,
        )                                                 # [TD, F]
        acc_h = acc_s[:, h, :] * scale[:, None] + partial
        acc_s[:, h, :] = acc_h

    # ---- relation bias ---------------------------------------------------
    bias_e = jnp.sum(onehot_r * bias_ref[:, 0][None, :], axis=1)  # [TE]
    b_new = b_s[0] + jnp.sum(
        onehot_d * (bias_e * maskf)[None, :], axis=1
    )                                                     # [TD]
    b_s[0] = b_new

    # ---- write normalized output (final chunk of the block wins) --------
    for h in range(heads):
        denom_h = jnp.maximum(l_s[h], eps)                # [TD]
        out_ref[:, h, :] = (
            acc_s[:, h, :] / denom_h[:, None] + b_new[:, None]
        )

    # Stats written as one full-block 3D store (Mosaic rejects 1-D writes
    # into 3-D refs); transposes are tiny [H, TD] arrays.
    m_t = m_s[:].T                                        # [TD, H]
    l_t = l_s[:].T
    b_t = jnp.broadcast_to(b_new[:, None], (td, heads))
    zeros = jnp.zeros((td, heads), jnp.float32)
    stats_ref[:] = jnp.stack(
        [m_t, l_t, b_t, zeros, zeros, zeros, zeros, zeros], axis=1
    )


def fused_relgat_forward(
    ps: jax.Array,          # [E_bp, H, F] gathered source features
    be: BlockedEdges,
    attn: jax.Array,        # [H, R, F]
    rel_bias: Optional[jax.Array],  # [R] or None
    *,
    negative_slope: float = 0.2,
    eps: float = 1e-16,
    attn_dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # int32 scalar
    with_stats: bool = False,
) -> jax.Array:
    """Returns ``[num_blocks * TD, H, F]`` aggregated+normalized messages
    (+bias); with ``with_stats`` also ``[NB*TD, 8, H]`` softmax statistics
    (row 0 = per-dst max m, row 1 = denominator l, row 2 = bias sum b —
    residuals for the flash-style backward). Rows of edge-less blocks are
    unwritten garbage — mask with ``be.block_nonempty``."""
    e_bp, heads, f = ps.shape
    te = be.chunk_edges
    td = be.block_nodes
    c = be.num_chunks
    num_rel = attn.shape[1]

    bias128 = jnp.zeros((num_rel, 128), jnp.float32)
    if rel_bias is not None:
        bias128 = bias128.at[:, 0].set(rel_bias.astype(jnp.float32))
    seed = jnp.reshape(
        (dropout_seed if dropout_seed is not None else jnp.int32(0)).astype(
            jnp.int32
        ),
        (1, 1),
    )

    kernel = functools.partial(
        _fused_kernel,
        heads=heads,
        num_rel=num_rel,
        block_nodes=td,
        negative_slope=negative_slope,
        eps=eps,
        attn_dropout_rate=attn_dropout_rate,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((te, heads, f), lambda i, cb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, te), lambda i, cb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, num_rel, f), lambda i, cb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_rel, 128), lambda i, cb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (td, heads, f), lambda i, cb: (cb[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (td, 8, heads), lambda i, cb: (cb[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((heads, td), jnp.float32),
            pltpu.VMEM((heads, td), jnp.float32),
            pltpu.VMEM((td, heads, f), jnp.float32),
            pltpu.VMEM((8, td), jnp.float32),
        ],
    )
    out, stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((be.num_blocks * td, heads, f), jnp.float32),
            jax.ShapeDtypeStruct((be.num_blocks * td, 8, heads), jnp.float32),
        ),
        interpret=_interpret(),
    )(be.chunk_block, ps, be.chunk_meta, attn, bias128, seed)
    if with_stats:
        return out, stats
    return out


# ---------------------------------------------------------------------------
# Backward: flash-style recompute from saved (m, l) statistics
# ---------------------------------------------------------------------------

def _bwd_kernel(
    cb_ref,      # [C] int32 scalar prefetch
    ps_ref,      # [TE, H, F]
    g_ref,       # [TD, H, F]   upstream gradient rows of this block
    out_ref_in,  # [TD, H, F]   forward output rows of this block
    stats_ref,   # [TD, 8, H]   (m, l, bias)
    meta_ref,    # [1, 8, TE]
    attn_ref,    # [H, R, F]
    dps_ref,     # [TE, H, F]  (out, streamed per chunk)
    dattn_ref,   # [H, R, F]   (out, accumulated across the whole grid)
    dbias_ref,   # [R, 128]    (out, accumulated; column 0)
    *,
    heads: int,
    num_rel: int,
    block_nodes: int,
    negative_slope: float,
    eps: float,
):
    c = pl.program_id(0)

    et = meta_ref[0, 0, :]
    ld = meta_ref[0, 1, :]
    mask_i = meta_ref[0, 2, :]
    te = et.shape[0]
    td = block_nodes
    maskf = (mask_i > 0).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    rel_ids = jax.lax.broadcasted_iota(jnp.int32, (te, num_rel), 1)
    onehot_r = (et[:, None] == rel_ids).astype(jnp.float32)   # [TE, R]
    rows = jax.lax.broadcasted_iota(jnp.int32, (td, te), 0)
    onehot_d = (rows == ld[None, :]).astype(jnp.float32)      # [TD, TE]

    bias_col = stats_ref[:, 2, 0][:, None]                    # [TD, 1]

    @pl.when(c == 0)
    def _():
        dattn_ref[:] = jnp.zeros_like(dattn_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    # Per-head 2D math, TE/F in lanes (see forward-kernel layout note).
    gsum = jnp.zeros((td,), jnp.float32)
    for h in range(heads):
        m_h = stats_ref[:, 0, h]                              # [TD]
        l_h = jnp.maximum(stats_ref[:, 1, h], eps)            # [TD]
        m_safe = jnp.where(m_h <= _NEG * 0.5, 0.0, m_h)

        # Recompute SDDMM
        rel_att = jnp.dot(onehot_r, attn_ref[h],
                          preferred_element_type=jnp.float32, precision=hi)
        eraw = jnp.sum(ps_ref[:, h, :] * rel_att, axis=1)     # [TE]
        e_h = jnp.where(eraw >= 0, eraw, negative_slope * eraw)
        e_h = jnp.where(maskf > 0, e_h, _NEG)

        m_e = jnp.sum(onehot_d * m_safe[:, None], axis=0)     # [TE]
        l_e = jnp.sum(onehot_d * l_h[:, None], axis=0)        # [TE]
        alpha = jnp.exp(e_h - m_e) / l_e * maskf              # [TE]

        # dalpha and the softmax-backward sum S = <out - bias, g> per dst
        g_e = jnp.dot(onehot_d.T, g_ref[:, h, :],
                      preferred_element_type=jnp.float32, precision=hi)
        dalpha = jnp.sum(ps_ref[:, h, :] * g_e, axis=1)       # [TE]
        agg_norm = out_ref_in[:, h, :] - bias_col             # [TD, F]
        s_h = jnp.sum(agg_norm * g_ref[:, h, :], axis=1)      # [TD]
        s_e = jnp.sum(onehot_d * s_h[:, None], axis=0)        # [TE]

        de = alpha * (dalpha - s_e)
        de = de * jnp.where(eraw >= 0, 1.0, negative_slope)   # LeakyReLU

        dps_ref[:, h, :] = alpha[:, None] * g_e + de[:, None] * rel_att
        dattn_ref[h] += jnp.dot(
            onehot_r.T, de[:, None] * ps_ref[:, h, :],
            preferred_element_type=jnp.float32, precision=hi,
        )
        gsum = gsum + jnp.sum(g_ref[:, h, :], axis=1)

    gs_e = jnp.sum(onehot_d * gsum[:, None], axis=0)          # [TE]
    contrib = jnp.sum(onehot_r * (gs_e * maskf)[:, None], axis=0)  # [R]
    # Full-ref masked accumulate: lane-column writes (dbias_ref[:, 0] +=)
    # miscompile on Mosaic, so spread the contribution onto column 0 only.
    lane = jax.lax.broadcasted_iota(jnp.int32, dbias_ref.shape, 1)
    dbias_ref[:] += jnp.where(lane == 0, contrib[:, None], 0.0)


def fused_relgat_backward(
    ps: jax.Array,       # [E_bp, H, F]
    g_blocks: jax.Array,  # [NB*TD, H, F] upstream grad (padded to blocks)
    out_blocks: jax.Array,  # [NB*TD, H, F] forward output (padded)
    stats: jax.Array,    # [NB*TD, 8, H]
    be: BlockedEdges,
    attn: jax.Array,     # [H, R, F]
    *,
    negative_slope: float = 0.2,
    eps: float = 1e-16,
):
    """Returns ``(dps [E_bp,H,F], dattn [H,R,F], dbias [R])``."""
    e_bp, heads, f = ps.shape
    te = be.chunk_edges
    td = be.block_nodes
    c = be.num_chunks
    num_rel = attn.shape[1]

    kernel = functools.partial(
        _bwd_kernel,
        heads=heads,
        num_rel=num_rel,
        block_nodes=td,
        negative_slope=negative_slope,
        eps=eps,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((te, heads, f), lambda i, cb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((td, heads, f), lambda i, cb: (cb[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((td, heads, f), lambda i, cb: (cb[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((td, 8, heads), lambda i, cb: (cb[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, te), lambda i, cb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, num_rel, f), lambda i, cb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((te, heads, f), lambda i, cb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, num_rel, f), lambda i, cb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_rel, 128), lambda i, cb: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    dps, dattn, dbias = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((e_bp, heads, f), jnp.float32),
            jax.ShapeDtypeStruct((heads, num_rel, f), jnp.float32),
            jax.ShapeDtypeStruct((num_rel, 128), jnp.float32),
        ),
        interpret=_interpret(),
    )(be.chunk_block, ps, g_blocks, out_blocks, stats, be.chunk_meta, attn)
    return dps, dattn, dbias[:, 0]


# ---------------------------------------------------------------------------
# Masked blocked scatter-sum (backward dL/dh accumulation per source node)
# ---------------------------------------------------------------------------

def _scatter_kernel(
    cb_ref, vals_ref, meta_ref, out_ref, *, heads: int, block_nodes: int
):
    c = pl.program_id(0)
    prev = cb_ref[jnp.maximum(c - 1, 0)]
    is_first = jnp.logical_or(c == 0, cb_ref[c] != prev)

    ld = meta_ref[0, 1, :]
    mask_i = meta_ref[0, 2, :]
    te = ld.shape[0]
    maskf = (mask_i > 0).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_nodes, te), 0)
    onehot = (rows == ld[None, :]).astype(jnp.float32) * maskf[None, :]

    for h in range(heads):
        partial = jnp.dot(
            onehot, vals_ref[:, h, :], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        @pl.when(is_first)
        def _():
            out_ref[:, h, :] = partial

        @pl.when(jnp.logical_not(is_first))
        def _():
            out_ref[:, h, :] += partial


def blocked_scatter_sum(values: jax.Array, be: BlockedEdges) -> jax.Array:
    """``out[n] = sum over real slots with local segment n of values`` over
    the given blocked layout (src-blocked for dL/dh). Returns
    ``[NB*TD, H, F]`` (empty blocks garbage — mask with block_nonempty)."""
    e_bp, heads, f = values.shape
    te = be.chunk_edges
    td = be.block_nodes
    c = be.num_chunks

    kernel = functools.partial(
        _scatter_kernel, heads=heads, block_nodes=td
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((te, heads, f), lambda i, cb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, te), lambda i, cb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (td, heads, f), lambda i, cb: (cb[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (be.num_blocks * td, heads, f), jnp.float32
        ),
        interpret=_interpret(),
    )(be.chunk_block, values, be.chunk_meta)
