"""Fused RelGAT Pallas kernels (v4).

One sequential pass over the block-padded edge stream (``data/blocked.py``).
Per chunk of TE edges (all in one destination block of TD nodes):

  1. SDDMM: one all-heads relation-attention gather via a single one-hot
     ``[TE, R] @ [R, H*F]`` MXU matmul, then all-heads logits via one
     block-diagonal ``[TE, H*F] @ [H*F, H]`` pass, masked LeakyReLU;
  2. online segment softmax (flash-attention-style) with a CHUNK-reference
     shift: running per-(dst, head) reference ``m`` and denominator ``l``
     in VMEM scratch, rescaled per chunk — softmax statistics never touch
     HBM. Flash merging only needs a per-dst-consistent shift, so ``m``
     tracks the per-head chunk max (a [TE, H] reduction) instead of the
     true per-dst max, which would cost a masked [TD, TE] segment max per
     head per chunk;
  3. denominators + relation bias: one ``onehot [TD, TE] @ [TE, H+1]``
     matmul; aggregation: ONE all-heads ``onehot [TD, TE] @ (p_exp * ps)
     [TE, H*F]`` matmul (p lane-broadcast per head) into a ``[TD, H*F]``
     VMEM accumulator, normalized and written once per block.

Layout rules learned on hardware (see git history):
- per-edge features stream as 2D ``[TE, H*F]`` blocks (a 3D ``[TE, H, F]``
  block pads H->8 sublanes and F->128 lanes, wasting up to 4x VMEM/VPU),
- per-head work uses static lane slices of the 2D block,
- hot intermediates keep TE or F in the lane dimension,
- no 1-D writes into >=2-D refs on the lane axis (Mosaic miscompiles);
  stats/dbias are written as full-block stores,
- per-edge gathers of per-dst scalars go through the MXU
  (``[1, TD] @ [TD, TE]``), not sublane reductions.

Numerics match the reference (denominator clamp 1e-16 —
``layer.py:280-293``): the chunk-reference shift is algebraically identical
to the max-shifted two-pass softmax; a dst whose own max sits ``delta``
below its chunks' references carries ``p ~ exp(-delta)`` — exact in fp32
(scale-invariant) until exp underflow at ``delta ~ 88``, far beyond
LeakyReLU'd logit spreads within TE-edge (256 default) chunks. Matmuls default to
HIGHEST (fp32) precision.

The backward recomputes the SDDMM from the saved ``(m, l)`` statistics and
uses the identity ``sum_e alpha_e * dalpha_e = <out_d - bias_d, g_d>`` so
the softmax backward is block-local.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from relgat_projector_tpu.data.blocked import BlockedEdges
from relgat_projector_tpu.data.layout_tuner import estimate_kernel_vmem

_NEG = float(-1e30)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Mosaic's default scoped-VMEM stack limit is 16M, but a v5e core has
# 128M: at the reference's doc-scale tile (16 heads x F=200 -> H*F=3200,
# `/root/reference/relgat_projector/core/model/layer.py:12-15`) even the
# smallest blocked layout legitimately needs >16M of live [TE, H*F]
# temporaries and the kernels fail to COMPILE (BENCH_NOTES r4
# "Production-tile VMEM wall"). When the measured envelope
# (data/layout_tuner.py, solved from compiler allocations) exceeds the
# default, raise `vmem_limit_bytes` with margin instead of OOMing; small
# tiles keep the default (None) so the bench-class configs compile
# byte-identically to round 3.
_DEFAULT_VMEM_LIMIT = 16 * 1024 * 1024
_MAX_VMEM_LIMIT = 100 * 1024 * 1024


def _compiler_params(td, te, hf, num_rel, precision):
    mode = (
        "default" if precision == jax.lax.Precision.DEFAULT else "highest"
    )
    est = estimate_kernel_vmem(td, te, hf, num_rel, mode)
    if est <= _DEFAULT_VMEM_LIMIT:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(_MAX_VMEM_LIMIT, int(est * 1.25))
    )


def _expand(a, heads: int, f: int, mxu_precision=None):
    # [X, H] -> [X, H*F] per-head-contiguous lane broadcast. Two lowerings,
    # chosen by MEASURED knockout profiling (BENCH_NOTES round 3):
    # - default: VPU broadcast chain. An MXU expansion matmul at HIGHEST
    #   costs ~2.2 ms/site (6 bf16 passes, K pads 4->128) to remove ~2.5 ms
    #   of broadcasts — measured net-slower in every HIGHEST config and in
    #   the forward (4 sites) at any precision.
    # - ``mxu_precision=Precision.DEFAULT`` (backward, bf16 kernel mode):
    #   ONE bf16 MXU pass per site; measured 11.79 -> 10.78 ms kernel-only
    #   at 1M edges. The bf16 rounding of the expanded per-head scalars is
    #   within the mode's documented error envelope.
    if mxu_precision is not None:
        hf = heads * f
        row_h = jax.lax.broadcasted_iota(jnp.int32, (heads, hf), 0)
        col_h = jax.lax.broadcasted_iota(jnp.int32, (heads, hf), 1) // f
        em = (row_h == col_h).astype(jnp.float32)         # [H, H*F]
        return jnp.dot(
            a, em, preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )
    return jnp.concatenate(
        [jnp.broadcast_to(a[:, h:h + 1], (a.shape[0], f))
         for h in range(heads)], axis=1,
    )


def _fused_kernel(
    cb_ref,      # [C] int32 scalar prefetch: block id per chunk
    ps_ref,      # [TE, H*F]
    meta_ref,    # [1, 8, TE] int32 (0=etype, 1=local_dst, 2=mask)
    attn_ref,    # [R, H*F]  (head-flattened relation-attention bank)
    bias_ref,    # [R, 128] f32 (column 0 holds rel_bias; zeros if disabled)
    seed_ref,    # [1, 1] int32 (attention-dropout seed)
    out_ref,     # [TD, H*F]
    stats_ref,   # [TD, 128] (lanes [0:H] = m, [H:2H] = l, [2H] = bias) —
    #              ONE dense lane tile. The previous [TD, 8, H] stack
    #              lane-padded H -> 128 (physical 8*128 lanes per row:
    #              a 1 MB striped store per TD=64 block vs the out block's
    #              64 KB — measured as the largest share of the fwd
    #              grid/DMA skeleton, BENCH_NOTES r4)
    m_s,         # scratch [TD, H] running per-(dst, head) reference shift
    l_s,         # scratch [TD, H] running denominators (in m_s reference)
    acc_s,       # scratch [TD, H*F] (head-major lane ranges)
    b_s,         # scratch [8, TD] (row 0)
    *,
    heads: int,
    feat: int,
    num_rel: int,
    block_nodes: int,
    negative_slope: float,
    eps: float,
    attn_dropout_rate: float,
    precision,
    ablate: frozenset = frozenset(),
):
    # ``ablate``: compile-time knockouts for scripts/tpu_bwd_profile.py
    # --forward (zero cost when empty; production callers never set it).
    c = pl.program_id(0)
    prev = cb_ref[jnp.maximum(c - 1, 0)]
    is_first = jnp.logical_or(c == 0, cb_ref[c] != prev)
    nc = pl.num_programs(0)
    nxt = cb_ref[jnp.minimum(c + 1, nc - 1)]
    # Last chunk of this dst block: only then are the normalized output
    # and final (m, l, bias) stats written. Earlier chunks of multi-chunk
    # blocks skip the [TD, H*F] divide/expand/store chain entirely — the
    # running state lives in scratch, and Mosaic flushes the out/stats
    # buffers at the block-index change right after this chunk anyway.
    is_last = jnp.logical_or(c == nc - 1, cb_ref[c] != nxt)

    et = meta_ref[0, 0, :]
    ld = meta_ref[0, 1, :]
    mask_i = meta_ref[0, 2, :]
    te = et.shape[0]
    td = block_nodes
    f = feat
    maskf = (mask_i > 0).astype(jnp.float32)             # [TE]
    hi = precision

    rel_ids = jax.lax.broadcasted_iota(jnp.int32, (te, num_rel), 1)
    onehot_r = (et[:, None] == rel_ids).astype(jnp.float32)   # [TE, R]
    rows = jax.lax.broadcasted_iota(jnp.int32, (td, te), 0)
    onehot_d = (rows == ld[None, :]).astype(jnp.float32)      # [TD, TE]

    @pl.when(is_first)
    def _():
        m_s[:] = jnp.full(m_s.shape, _NEG, jnp.float32)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)
        b_s[:] = jnp.zeros_like(b_s)

    # One all-heads relation-attention gather: [TE, R] @ [R, H*F].
    if "relgather" in ablate:
        rel_att_all = attn_ref[0:1, :] + jnp.zeros(
            (te, heads * f), jnp.float32
        )
    else:
        rel_att_all = jnp.dot(
            onehot_r, attn_ref[:], preferred_element_type=jnp.float32,
            precision=hi,
        )                                                 # [TE, H*F]

    # All-heads SDDMM via the block-diagonal MXU pass (same trick as the
    # backward): per-head lane reductions become one [TE, HF] @ [HF, H].
    hf0 = heads * f
    # bf16 stream in "default"-precision mode (halves the dominant HBM
    # traffic); upcast once at read — the MXU runs bf16 passes either way.
    ps_all = ps_ref[:].astype(jnp.float32)                # [TE, H*F]
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hf0, heads), 0) // f
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hf0, heads), 1)
    bdiag = (col_h == row_h).astype(jnp.float32)          # [HF, H]
    if "sddmm" in ablate:
        eraw_all = (ps_all * rel_att_all)[:, :heads]
    else:
        eraw_all = jnp.dot(
            ps_all * rel_att_all, bdiag, preferred_element_type=jnp.float32,
            precision=hi,
        )                                                 # [TE, H]
    e_all = jnp.where(eraw_all >= 0, eraw_all, negative_slope * eraw_all)
    e_all = jnp.where(maskf[:, None] > 0, e_all, _NEG)    # [TE, H]

    # CHUNK-REFERENCE online softmax: flash-style merging only needs a
    # per-dst-CONSISTENT shift between the numerator terms and (m, l) —
    # not the true per-dst max. Using the per-head chunk max (a cheap
    # [TE, H] reduction) eliminates the per-head masked [TD, TE] segment
    # max, the per-dst m gather, AND the [TD, TE] weighted-one-hot build
    # that dominated the forward's VPU time. A dst whose own max sits
    # delta below the chunk max carries p ~ exp(-delta); ratios stay exact
    # in fp32 until delta ~ 88 (exp underflow) — far beyond LeakyReLU'd
    # attention-logit spreads within one TE-edge chunk.
    c_m = jnp.max(e_all, axis=0)                          # [H]
    p_all = jnp.exp(e_all - c_m[None, :]) * maskf[:, None]  # [TE, H]
    # One [TD, TE] @ [TE, H+1] matmul accumulates both the per-dst
    # denominators and the per-dst relation-bias sum.
    bias_e = jnp.sum(onehot_r * bias_ref[:, 0][None, :], axis=1)  # [TE]
    if "lbias" in ablate:
        # reshape-then-slice: slice+newaxis mixed indexing leaves jnp's
        # slice fast path and lowers to a 1-D gather Mosaic rejects.
        pl_bias = jnp.concatenate(
            [p_all[:td, :], (bias_e * maskf).reshape(te, 1)[:td, :]],
            axis=1,
        )  # keeps p_all/bias_e live without the matmul
    else:
        pl_bias = jnp.dot(
            onehot_d,
            jnp.concatenate([p_all, (bias_e * maskf)[:, None]], axis=1),
            preferred_element_type=jnp.float32, precision=hi,
        )                                                 # [TD, H+1]
    partial_l = pl_bias[:, :heads]                        # [TD, H]

    m_prev = m_s[:]                                       # [TD, H]
    if "merge" in ablate:
        m_new = m_prev
        scale_prev = m_prev
        scale_chunk = partial_l
        l_new_all = l_s[:] + partial_l
    else:
        m_new = jnp.maximum(m_prev, c_m[None, :])
        # exp(_NEG - _NEG) = 1 is harmless here: such rows carry l = 0 and
        # partial_l = 0, and exp(_NEG - real) flushes to 0 in fp32.
        scale_prev = jnp.exp(m_prev - m_new)              # [TD, H]
        scale_chunk = jnp.exp(c_m[None, :] - m_new)       # [TD, H]
        l_new_all = l_s[:] * scale_prev + partial_l * scale_chunk
    m_s[:] = m_new
    l_s[:] = l_new_all

    # attention-weight dropout (reference ``layer.py:296-297``): applied to
    # normalized weights -> to p in the numerator only (denominator l keeps
    # the un-dropped weights, matching dropout AFTER normalization). The
    # mask hashes (seed, canonical edge id, head) — ``ops/dropout.py`` —
    # so the src-blocked backward replays it bit-exactly from the seed.
    p_acc_all = p_all                                     # [TE, H]
    if attn_dropout_rate > 0.0:
        from relgat_projector_tpu.ops.dropout import edge_keep_mask_all_heads

        eid = meta_ref[0, 3, :]                           # [TE]
        keep = edge_keep_mask_all_heads(
            eid, heads, seed_ref[0, 0], attn_dropout_rate
        )
        p_acc_all = p_all * keep / (1.0 - attn_dropout_rate)

    # ONE all-heads aggregation matmul (N=H*F fills the MXU lanes; the
    # per-head N=F variant issued H matmuls at half lane utilization and
    # its slice/broadcast chains dominated the per-chunk op count).
    if "expand" in ablate:
        weighted = ps_all
    else:
        weighted = _expand(p_acc_all, heads, f) * ps_all
    if "agg" in ablate:
        partial_all = weighted[:td, :]  # keeps the product live, no matmul
    else:
        partial_all = jnp.dot(
            onehot_d, weighted,
            preferred_element_type=jnp.float32, precision=hi,
        )                                                 # [TD, H*F]
    if "expand" in ablate:
        acc_new = acc_s[:] + partial_all
    else:
        acc_new = (
            acc_s[:] * _expand(scale_prev, heads, f)
            + partial_all * _expand(scale_chunk, heads, f)
        )
    acc_s[:] = acc_new

    # ---- relation bias (accumulated via the fused matmul above) ---------
    b_new = b_s[0] + pl_bias[:, heads]                    # [TD]
    b_s[0] = b_new

    # ---- write normalized output (only the block's final chunk) ---------
    @pl.when(is_last)
    def _():
        denom = jnp.maximum(l_new_all, eps)               # [TD, H]
        if "out" in ablate:
            out_ref[:] = acc_new
        elif "expand" in ablate:
            out_ref[:] = acc_new / denom[:, :1] + b_new[:, None]
        else:
            out_ref[:] = (
                acc_new / _expand(denom, heads, f) + b_new[:, None]
            )                                             # [TD, H*F]

        # Stats: ONE dense [TD, 128] lane-tile store (m | l | bias | 0).
        if "stats" in ablate:
            stats_ref[:] = jnp.broadcast_to(m_new[:, :1], (td, 128))
        else:
            stats_ref[:] = jnp.concatenate(
                [
                    m_new,
                    l_new_all,
                    b_new[:, None],
                    jnp.zeros((td, 128 - 2 * heads - 1), jnp.float32),
                ],
                axis=1,
            )


def fused_relgat_forward(
    ps: jax.Array,          # [E_bp, H*F] gathered source features (2D!)
    be: BlockedEdges,
    attn: jax.Array,        # [H, R, F]
    rel_bias: Optional[jax.Array],  # [R] or None
    *,
    negative_slope: float = 0.2,
    eps: float = 1e-16,
    attn_dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # int32 scalar
    with_stats: bool = False,
    precision=jax.lax.Precision.HIGHEST,
    ablate: frozenset = frozenset(),  # profiling knockouts; see kernel doc
):
    """Returns ``[num_blocks * TD, H*F]`` aggregated+normalized messages
    (+bias); with ``with_stats`` also ``[NB*TD, 128]`` softmax statistics
    (lanes [0:H] = m, [H:2H] = l, [2H] = bias — residuals for the
    backward; one dense lane tile, see the kernel's stats_ref note). Rows
    of edge-less blocks are unwritten garbage — mask with
    ``be.block_nonempty``."""
    heads, num_rel, f = attn.shape
    assert 2 * heads + 1 <= 128, "stats lane layout needs H <= 63"
    e_bp, hf = ps.shape
    assert hf == heads * f
    te = be.chunk_edges
    td = be.block_nodes
    c = be.num_chunks

    # Head-flattened bank: [R, H*F] with per-head contiguous lane ranges.
    attn_flat = jnp.transpose(attn, (1, 0, 2)).reshape(num_rel, heads * f)

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
        feat=f,
        num_rel=num_rel,
        block_nodes=td,
        negative_slope=negative_slope,
        eps=eps,
        attn_dropout_rate=attn_dropout_rate,
        precision=precision,
        ablate=ablate,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((te, hf), lambda i, cb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, te), lambda i, cb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_rel, hf), lambda i, cb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_rel, 128), lambda i, cb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((td, hf), lambda i, cb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((td, 128), lambda i, cb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((td, heads), jnp.float32),
            pltpu.VMEM((td, heads), jnp.float32),
            pltpu.VMEM((td, heads * f), jnp.float32),
            pltpu.VMEM((8, td), jnp.float32),
        ],
    )
    out, stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((be.num_blocks * td, hf), jnp.float32),
            jax.ShapeDtypeStruct((be.num_blocks * td, 128), jnp.float32),
        ),
        compiler_params=_compiler_params(td, te, hf, num_rel, precision),
        interpret=_interpret(),
    )(be.chunk_block, ps, be.chunk_meta, attn_flat, bias128, seed)
    if with_stats:
        return out, stats
    return out


# ---------------------------------------------------------------------------
# Backward v2: ONE src-blocked kernel.
#
# dh[s] = sum_{e: src_e = s} alpha_e * g[dst_e] + de_e * rel_att[et_e]
# with alpha/de recomputed per edge from per-dst statistics gathered by
# XLA (m, l, and the softmax-backward sum S = <out - bias, g> — all tiny
# [N, H] arrays). Eliminates the dst-ordered backward kernel, the [E, H*F]
# dps materialization, its 1.2x2 GB permutation, and the separate scatter
# pass: everything accumulates into dh/dattn/dbias in one pass over the
# SRC-blocked edge stream (where the ps gather has sorted indices, i.e. is
# nearly sequential).
# ---------------------------------------------------------------------------

def _bwd_src_kernel(
    cb_ref,      # [C] int32 scalar prefetch (src-blocked chunk -> block)
    cbh_ref,     # [C] int32 scalar prefetch: h-block id per chunk (equals
    #              cb for the plain/halo paths; cb + segment offset for the
    #              scanned path, whose block ids are segment-local)
    h_ref,       # [TD, H*F]  the chunk's SOURCE block of node features —
    #              every edge in a src-blocked chunk reads from ONE block,
    #              so the [E_bp, H*F] ps_src gather is gone: Mosaic revisits
    #              this block across the block's chunks (no re-DMA) and the
    #              kernel gathers rows with the one-hot MXU trick below
    ge_ref,      # [TE, H*F + 8*H]  PACKED per-edge stream gathered at dst:
    #              cols [0:HF] = g rows; then per-edge stats. fp32 layout
    #              (exact modes): [HF+0:HF+H]=m, [HF+H:HF+2H]=l,
    #              [HF+2H:HF+3H]=S, col HF+3H = gsum (sum_{h,f} g[dst]).
    #              bf16 layout (packed_bf16, "default" mode): each stat is
    #              a (hi, lo) bf16 PAIR recombined to fp32-grade here —
    #              m at [HF:HF+2H], l at [HF+2H:HF+4H], S at [HF+4H:HF+6H],
    #              gsum at cols HF+6H / HF+6H+1. One wide gather, sliced
    #              IN VMEM — host-side slices of the packed gather
    #              materialized multi-GB copies at 8M edges.
    meta_ref,    # [1, 8, TE]  (0=etype, 1=local_src, 2=mask, 3=edge id)
    attn_ref,    # [R, H*F]
    seed_ref,    # [1, 1] int32 (attention-dropout hash seed)
    dh_ref,      # [TD, H*F]  (out, accumulated per src block)
    dattn_ref,   # [R, H*F]   (out, accumulated across the whole grid)
    dbias_ref,   # [R, 128]   (out, accumulated; column 0)
    *,
    heads: int,
    feat: int,
    num_rel: int,
    block_nodes: int,
    negative_slope: float,
    eps: float,
    attn_dropout_rate: float,
    precision,
    packed_bf16: bool = False,
    ablate: frozenset = frozenset(),
):
    # ``ablate`` knocks out named sub-computations at COMPILE time (Python
    # conditionals on a static set — zero cost when empty) so
    # ``scripts/tpu_bwd_profile.py`` can attribute the measured kernel time
    # op-by-op on hardware. Production callers never set it.
    c = pl.program_id(0)
    prev = cb_ref[jnp.maximum(c - 1, 0)]
    is_first = jnp.logical_or(c == 0, cb_ref[c] != prev)

    et = meta_ref[0, 0, :]
    ls = meta_ref[0, 1, :]
    mask_i = meta_ref[0, 2, :]
    te = et.shape[0]
    td = block_nodes
    f = feat
    maskf = (mask_i > 0).astype(jnp.float32)
    hi = precision

    rel_ids = jax.lax.broadcasted_iota(jnp.int32, (te, num_rel), 1)
    onehot_r = (et[:, None] == rel_ids).astype(jnp.float32)   # [TE, R]
    rows = jax.lax.broadcasted_iota(jnp.int32, (td, te), 0)
    onehot_s = (rows == ls[None, :]).astype(jnp.float32)      # [TD, TE]

    @pl.when(c == 0)
    def _():
        dattn_ref[:] = jnp.zeros_like(dattn_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    if "relgather" in ablate:
        rel_att_all = attn_ref[0:1, :] + jnp.zeros(
            (te, heads * feat), jnp.float32
        )
    else:
        rel_att_all = jnp.dot(
            onehot_r, attn_ref[:], preferred_element_type=jnp.float32,
            precision=hi,
        )                                                 # [TE, H*F]

    # All-heads SDDMM recompute + dalpha via TWO block-diagonal MXU passes
    # instead of 2*H per-head [TE, F] lane reductions (VPU chains were the
    # backward's bottleneck): (ps * x) @ blockdiag[HF, H].
    hf0 = heads * f
    g_all = ge_ref[:, :hf0].astype(jnp.float32)           # [TE, H*F]
    # In-kernel per-edge source gather: one-hot row-select from the
    # chunk's source block (per-edge gathers through the MXU is the
    # project's established pattern; masked slots pick garbage rows whose
    # logits are clamped to _NEG below, so alpha/de are exactly zero).
    if "gather" in ablate:
        ps_all = g_all
    else:
        ps_all = jnp.dot(
            onehot_s.T, h_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32, precision=hi,
        )                                                 # [TE, H*F]
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hf0, heads), 0) // f
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hf0, heads), 1)
    bd = (col_h == row_h).astype(jnp.float32)             # [HF, H]
    if "sddmm" in ablate:
        eraw_all = jnp.zeros((te, heads), jnp.float32)
    else:
        eraw_all = jnp.dot(
            ps_all * rel_att_all, bd, preferred_element_type=jnp.float32,
            precision=hi,
        )                                                 # [TE, H]
    if "dalpha" in ablate:
        dalpha_all = eraw_all
    else:
        dalpha_all = jnp.dot(
            ps_all * g_all, bd, preferred_element_type=jnp.float32,
            precision=hi,
        )                                                 # [TE, H]

    # Remaining per-edge work runs as [TE, H] PANELS (H=4 lanes pad to 128
    # — 32x lane waste, but these are tiny arrays and one panel op replaces
    # H per-head ops: the per-chunk Mosaic op COUNT, not VPU throughput, is
    # what the grid amortizes worst). The earlier slower "panel variant"
    # (80.6 vs 75.8 ms) expanded [TE, H] -> [TE, H*F] with K=4 MXU matmuls;
    # this one uses VPU lane broadcasts.
    if "stats" in ablate:
        m_all = jnp.zeros((te, heads), jnp.float32)
        l_all = jnp.ones((te, heads), jnp.float32)
        s_all = jnp.zeros((te, heads), jnp.float32)
    elif packed_bf16:
        # (hi, lo) bf16 pairs -> fp32-grade stats (see _packed_stream).
        def _pairs(c0):
            return (
                ge_ref[:, c0:c0 + heads].astype(jnp.float32)
                + ge_ref[:, c0 + heads:c0 + 2 * heads].astype(jnp.float32)
            )

        m_all = _pairs(hf0)
        l_all = jnp.maximum(_pairs(hf0 + 2 * heads), eps)
        s_all = _pairs(hf0 + 4 * heads)
    else:
        m_all = ge_ref[:, hf0:hf0 + heads].astype(jnp.float32)  # [TE, H]
        l_all = jnp.maximum(
            ge_ref[:, hf0 + heads:hf0 + 2 * heads].astype(jnp.float32), eps
        )
        s_all = ge_ref[:, hf0 + 2 * heads:hf0 + 3 * heads].astype(
            jnp.float32
        )
    if "vpu" in ablate:
        alpha_all = eraw_all
        aw_all = alpha_all
        de_all = dalpha_all
    else:
        m_safe = jnp.where(m_all <= _NEG * 0.5, 0.0, m_all)
        e_act = jnp.where(
            eraw_all >= 0, eraw_all, negative_slope * eraw_all
        )
        # Clamp masked slots BEFORE the exp (mirroring the forward): their
        # recomputed logits pair garbage rows with garbage stats, and
        # exp(overflow) * maskf would be inf * 0 = NaN, not 0.
        e_act = jnp.where(maskf[:, None] > 0, e_act, _NEG)
        alpha_all = (
            jnp.exp(e_act - m_safe) / l_all * maskf[:, None]
        )                                                 # [TE, H]

        # Replay the forward's attention-dropout mask (hash of the seed +
        # canonical edge id + head; see the forward kernel /
        # ops/dropout.py). With dropped weights a~ = alpha * k: dps gets
        # a~ * g, and dalpha -> k * <ps, g>; the softmax-backward sum S
        # (computed from out·g, which already includes the dropout) is
        # unchanged.
        aw_all = alpha_all
        dmul_all = dalpha_all
        if attn_dropout_rate > 0.0:
            from relgat_projector_tpu.ops.dropout import (
                edge_keep_mask_all_heads,
            )

            eid = meta_ref[0, 3, :]
            k_all = edge_keep_mask_all_heads(
                eid, heads, seed_ref[0, 0], attn_dropout_rate
            ) / (1.0 - attn_dropout_rate)
            aw_all = alpha_all * k_all
            dmul_all = dalpha_all * k_all
        de_all = alpha_all * (dmul_all - s_all)
        de_all = de_all * jnp.where(eraw_all >= 0, 1.0, negative_slope)

    if "expand" in ablate:
        contrib = g_all + rel_att_all
        deps = ps_all
    else:
        # bf16 kernel mode expands on the MXU (1 pass; measured faster);
        # exact tiers keep the VPU broadcasts (see _expand).
        exp_prec = (
            hi if hi == jax.lax.Precision.DEFAULT else None
        )
        de_exp = _expand(de_all, heads, f, exp_prec)      # [TE, H*F]
        contrib = (
            _expand(aw_all, heads, f, exp_prec) * g_all
            + de_exp * rel_att_all
        )
        deps = de_exp * ps_all                            # [TE, H*F]
    if "dh" in ablate:
        partial = contrib[:td, :]  # keeps contrib live (no DCE), no matmul
    else:
        partial = jnp.dot(
            onehot_s, contrib, preferred_element_type=jnp.float32,
            precision=hi,
        )                                                 # [TD, H*F]

    if "dh_rmw" in ablate:
        dh_ref[:] = partial
    else:
        @pl.when(is_first)
        def _():
            dh_ref[:] = partial

        @pl.when(jnp.logical_not(is_first))
        def _():
            dh_ref[:] += partial

    # One [R, TE] @ [TE, H*F] matmul for all heads' dattn contributions
    # (N=H*F utilizes the MXU far better than per-head N=F passes).
    if "dattn" in ablate:
        dattn_ref[:] += deps[:num_rel, :]  # keeps deps live, no matmul
    elif "dattn_rmw" in ablate:
        dattn_ref[:] = jnp.dot(
            onehot_r.T, deps, preferred_element_type=jnp.float32,
            precision=hi,
        )
    else:
        dattn_ref[:] += jnp.dot(
            onehot_r.T, deps, preferred_element_type=jnp.float32,
            precision=hi,
        )

    if "dbias" not in ablate:
        if packed_bf16:
            gs_e = (
                ge_ref[:, hf0 + 6 * heads].astype(jnp.float32)
                + ge_ref[:, hf0 + 6 * heads + 1].astype(jnp.float32)
            )                                                    # [TE]
        else:
            gs_e = ge_ref[:, hf0 + 3 * heads].astype(jnp.float32)  # [TE]
        bias_contrib = jnp.sum(onehot_r * (gs_e * maskf)[:, None], axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, dbias_ref.shape, 1)
        dbias_ref[:] += jnp.where(lane == 0, bias_contrib[:, None], 0.0)


def fused_relgat_backward_src(
    h_blocks: jax.Array,  # [NB_h*TD, H*F] SOURCE node features, 2D, padded
    #                       to whole blocks (src-blocked chunks read one
    #                       block each — no [E_bp, H*F] gather)
    ge_packed: jax.Array,  # [E_bp_src, H*F + 8*H] gathered at by_src.dst:
    #                        g rows ++ per-edge stats (m, l, S, gsum cols)
    bs: BlockedEdges,     # src-blocked layout
    attn: jax.Array,      # [H, R, F]
    *,
    chunk_block_h: Optional[jax.Array] = None,  # [C] h-block id per chunk
    #   (defaults to bs.chunk_block; the scanned path passes local block
    #   ids offset into the global h)
    negative_slope: float = 0.2,
    eps: float = 1e-16,
    attn_dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # int32 scalar
    precision=jax.lax.Precision.HIGHEST,
    ablate: frozenset = frozenset(),  # profiling knockouts; see kernel doc
):
    """Returns ``(dh_blocks [NB*TD, H*F], dattn [H, R, F], dbias [R])``."""
    heads, num_rel, f = attn.shape
    hf = heads * f
    te = bs.chunk_edges
    td = bs.block_nodes
    c = bs.num_chunks
    if chunk_block_h is None:
        chunk_block_h = bs.chunk_block

    attn_flat = jnp.transpose(attn, (1, 0, 2)).reshape(num_rel, hf)
    seed = jnp.reshape(
        (dropout_seed if dropout_seed is not None else jnp.int32(0)).astype(
            jnp.int32
        ),
        (1, 1),
    )

    kernel = functools.partial(
        _bwd_src_kernel,
        heads=heads,
        feat=f,
        num_rel=num_rel,
        block_nodes=td,
        negative_slope=negative_slope,
        eps=eps,
        attn_dropout_rate=attn_dropout_rate,
        precision=precision,
        packed_bf16=ge_packed.dtype == jnp.bfloat16,
        ablate=ablate,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((td, hf), lambda i, cb, cbh: (cbh[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((te, hf + 8 * heads), lambda i, cb, cbh: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, te), lambda i, cb, cbh: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_rel, hf), lambda i, cb, cbh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((td, hf), lambda i, cb, cbh: (cb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_rel, hf), lambda i, cb, cbh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_rel, 128), lambda i, cb, cbh: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    dh_blocks, dattn_flat, dbias = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bs.num_blocks * td, hf), jnp.float32),
            jax.ShapeDtypeStruct((num_rel, hf), jnp.float32),
            jax.ShapeDtypeStruct((num_rel, 128), jnp.float32),
        ),
        compiler_params=_compiler_params(td, te, hf, num_rel, precision),
        interpret=_interpret(),
    )(bs.chunk_block, chunk_block_h, h_blocks, ge_packed, bs.chunk_meta,
      attn_flat, seed)
    dattn = jnp.transpose(dattn_flat.reshape(num_rel, heads, f), (1, 0, 2))
    return dh_blocks, dattn, dbias[:, 0]
