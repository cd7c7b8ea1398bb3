"""Pallas TPU kernels for RelGAT message passing.

TPU-native replacement for the reference's torch-scatter CUDA primitives
(``core/model/layer.py:284-316``), built on the block-padded edge layout
(``data/blocked.py``):

- **SDDMM kernel**: per-edge attention logits. The per-relation attention
  bank stays resident in VMEM and is gathered per edge with a one-hot
  ``[TE, R] @ [R, F]`` matmul (no ``[E, H, F]`` rel-att materialization),
  fused with the masked LeakyReLU.
- **Blocked-aggregate kernel**: the SpMM. Each chunk of TE edges belongs to
  one destination block of TD nodes; "scatter-add per destination" becomes
  ``(onehot * alpha) [TD, TE] @ msgs [TE, F]`` — a dense MXU matmul per
  (chunk, head) — accumulated in VMEM across the block's chunks and written
  to HBM once per block. No dynamic scatter, no atomics.

The grid is sequential on TPU, chunks of one block are contiguous, and the
output BlockSpec index map revisits the same block for consecutive chunks,
so accumulation happens in VMEM (standard Pallas revisiting pattern).

Softmax statistics between the two kernels are tiny ``[H, E]`` arrays
handled by XLA sorted-segment ops.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from relgat_projector_tpu.data.blocked import BlockedEdges, BlockedGraph
from relgat_projector_tpu.ops.segment import (
    STABLE_SOFTMAX_EPS,
    segment_max,
    segment_sum,
)

_NEG_INF = float(-1e30)  # used instead of -inf inside kernels (VPU-safe)


def _interpret() -> bool:
    """Interpreter mode off-TPU so the kernels run (and are tested) on the
    virtual CPU mesh."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Kernel 1: SDDMM — per-edge attention logits
# ---------------------------------------------------------------------------

def _sddmm_kernel(
    ps_ref,      # [H, TE, F]
    meta_ref,    # [1, 8, TE] int32 (row 0 = etype, row 2 = mask)
    attn_ref,    # [H, R, F]
    out_ref,     # [1, H, TE]
    *,
    heads: int,
    num_rel: int,
    negative_slope: float,
):
    et = meta_ref[0, 0, :]                              # [TE]
    mask = meta_ref[0, 2, :]                            # [TE]
    te = et.shape[0]
    rel_ids = jax.lax.broadcasted_iota(jnp.int32, (te, num_rel), 1)
    onehot_r = (et[:, None] == rel_ids).astype(jnp.float32)  # [TE, R]
    for h in range(heads):
        # HIGHEST: keep fp32 MXU passes — the one-hot gather must be exact
        # and parity with the reference is fp32.
        rel_att = jnp.dot(
            onehot_r, attn_ref[h], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                               # [TE, F]
        e = jnp.sum(ps_ref[h] * rel_att, axis=1)        # [TE]
        e = jnp.where(e >= 0, e, negative_slope * e)    # LeakyReLU
        out_ref[0, h, :] = jnp.where(mask > 0, e, _NEG_INF)


def sddmm_scores(
    ps: jax.Array,        # [H, E_bp, F]
    chunk_meta: jax.Array,  # [C, 8, TE] int32
    attn: jax.Array,      # [H, R, F]
    *,
    negative_slope: float = 0.2,
) -> jax.Array:
    """Masked LeakyReLU attention logits ``[C, H, TE]``."""
    heads, e_bp, f = ps.shape
    c, _, te = chunk_meta.shape
    num_rel = attn.shape[1]

    kernel = functools.partial(
        _sddmm_kernel,
        heads=heads,
        num_rel=num_rel,
        negative_slope=negative_slope,
    )
    return pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((heads, te, f), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, te), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, num_rel, f), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, heads, te), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, heads, te), jnp.float32),
        interpret=_interpret(),
    )(ps, chunk_meta, attn)


# ---------------------------------------------------------------------------
# Kernel 2: blocked aggregate — weighted scatter-add as one-hot matmul
# ---------------------------------------------------------------------------

def _aggregate_kernel(
    cb_ref,      # [C] int32 scalar-prefetch: block id per chunk
    ps_ref,      # [H, TE, F]
    alpha_ref,   # [1, H, TE]
    meta_ref,    # [1, 8, TE] int32 (row 1 = local dst in [0, TD))
    out_ref,     # [H, TD, F]
    *,
    heads: int,
    block_nodes: int,
):
    c = pl.program_id(0)
    prev = cb_ref[jnp.maximum(c - 1, 0)]
    is_first = jnp.logical_or(c == 0, cb_ref[c] != prev)

    ld = meta_ref[0, 1, :]                               # [TE]
    te = ld.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_nodes, te), 0)
    onehot = (rows == ld[None, :]).astype(jnp.float32)   # [TD, TE]

    for h in range(heads):
        w = onehot * alpha_ref[0, h][None, :]            # [TD, TE]
        partial = jnp.dot(
            w, ps_ref[h], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                # [TD, F]

        @pl.when(is_first)
        def _():
            out_ref[h] = partial

        @pl.when(jnp.logical_not(is_first))
        def _():
            out_ref[h] += partial


def blocked_aggregate(
    ps: jax.Array,        # [H, E_bp, F]
    alpha_cht: jax.Array,  # [C, H, TE]
    chunk_meta: jax.Array,  # [C, 8, TE] int32
    chunk_block: jax.Array,  # [C] int32
    *,
    num_blocks: int,
    block_nodes: int,
) -> jax.Array:
    """Aggregated messages ``[H, num_blocks * TD, F]`` (empty blocks hold
    garbage — mask with ``block_nonempty`` afterwards)."""
    heads, e_bp, f = ps.shape
    c, _, te = alpha_cht.shape

    kernel = functools.partial(
        _aggregate_kernel, heads=heads, block_nodes=block_nodes
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((heads, te, f), lambda i, cb: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, te), lambda i, cb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, te), lambda i, cb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (heads, block_nodes, f), lambda i, cb: (0, cb[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (heads, num_blocks * block_nodes, f), jnp.float32
        ),
        interpret=_interpret(),
    )(chunk_block, ps, alpha_cht, chunk_meta)


# ---------------------------------------------------------------------------
# Fused propagate: gather -> SDDMM -> segment softmax -> aggregate (+bias)
# ---------------------------------------------------------------------------

def _propagate_fwd_impl(
    h: jax.Array,          # [N_pad, H, F]
    attn_bank: jax.Array,  # [H, R, F]
    rel_bias: Optional[jax.Array],
    be: BlockedEdges,
    num_nodes: int,
    *,
    negative_slope: float,
    eps: float,
    attn_dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    heads, num_rel, f = attn_bank.shape
    te = be.chunk_edges
    td = be.block_nodes
    c = be.num_chunks
    e_bp = be.num_slots

    hm = jnp.transpose(h, (1, 0, 2))                     # [H, N, F] head-major
    ps = jnp.take(hm, be.src, axis=1)                    # [H, E_bp, F]

    e_scores = sddmm_scores(
        ps, be.chunk_meta, attn_bank.astype(jnp.float32),
        negative_slope=negative_slope,
    )                                                    # [C, H, TE]

    # Softmax stats with XLA sorted-segment ops on the tiny [H, E] scores.
    e_flat = jnp.transpose(e_scores, (1, 0, 2)).reshape(heads, e_bp)
    seg = be.dst
    mx = segment_max(e_flat.T, seg, num_nodes, indices_are_sorted=True)  # [N, H]
    mx = jnp.where(mx <= _NEG_INF, 0.0, mx)
    w = jnp.exp(e_flat.T - mx[seg])                      # [E_bp, H]
    w = w * be.mask[:, None]  # exp(_NEG_INF) underflows to 0 anyway; exact 0
    denom = segment_sum(w, seg, num_nodes, indices_are_sorted=True)
    denom = jnp.maximum(denom, eps)
    alpha = w / denom[seg]                               # [E_bp, H]

    if attn_dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - attn_dropout_rate, alpha.shape
        )
        alpha = jnp.where(keep, alpha / (1.0 - attn_dropout_rate), 0.0)

    alpha_cht = jnp.transpose(alpha.reshape(c, te, heads), (0, 2, 1))

    agg = blocked_aggregate(
        ps, alpha_cht, be.chunk_meta, be.chunk_block,
        num_blocks=be.num_blocks, block_nodes=td,
    )                                                    # [H, NB*TD, F]
    agg = agg[:, :num_nodes, :]
    # Zero rows of blocks the kernel never visited (no incoming edges) —
    # their output is uninitialized garbage (possibly inf/NaN), so select,
    # don't multiply.
    node_block_mask = jnp.repeat(be.block_nonempty, td)[:num_nodes]
    agg = jnp.where(node_block_mask[None, :, None] > 0, agg, 0.0)

    out = jnp.transpose(agg, (1, 0, 2))                  # [N, H, F]

    if rel_bias is not None:
        bias_e = jnp.take(rel_bias, be.etype) * be.mask
        bias_n = segment_sum(bias_e, seg, num_nodes, indices_are_sorted=True)
        out = out + bias_n[:, None, None]
    return out


def _xla_reference(
    h, attn_bank, rel_bias, be: BlockedEdges, num_nodes,
    *, negative_slope, eps, attn_dropout_rate=0.0, dropout_rng=None,
):
    """XLA propagate on the blocked arrays (identical math; used for the
    v1 backward pass via jax.vjp and as the validation oracle)."""
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
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def _propagate_pallas(
    h, attn_bank, rel_bias,
    blocked, negative_slope, eps, attn_dropout_rate, rng_key_data, num_nodes,
):
    rng = (
        jax.random.wrap_key_data(rng_key_data)
        if rng_key_data is not None
        else None
    )
    return _propagate_fwd_impl(
        h, attn_bank, rel_bias, blocked.by_dst, num_nodes,
        negative_slope=negative_slope, eps=eps,
        attn_dropout_rate=attn_dropout_rate, dropout_rng=rng,
    )


def _propagate_fwd(
    h, attn_bank, rel_bias,
    blocked, negative_slope, eps, attn_dropout_rate, rng_key_data, num_nodes,
):
    out = _propagate_pallas(
        h, attn_bank, rel_bias, blocked, negative_slope, eps,
        attn_dropout_rate, rng_key_data, num_nodes,
    )
    return out, (h, attn_bank, rel_bias)


def _propagate_bwd(
    blocked, negative_slope, eps, attn_dropout_rate, rng_key_data, num_nodes,
    residuals, g,
):
    # v1 backward: differentiate the mathematically-identical XLA formulation
    # (recompute-in-backward, like full rematerialization). A hand-written
    # Pallas backward (src-blocked scatter kernel) is the planned v2.
    h, attn_bank, rel_bias = residuals
    rng = (
        jax.random.wrap_key_data(rng_key_data)
        if rng_key_data is not None
        else None
    )

    def f(h_, a_, b_):
        return _xla_reference(
            h_, a_, b_, blocked.by_dst, num_nodes,
            negative_slope=negative_slope, eps=eps,
            attn_dropout_rate=attn_dropout_rate, dropout_rng=rng,
        )

    if rel_bias is None:
        _, vjp = jax.vjp(lambda h_, a_: f(h_, a_, None), h, attn_bank)
        dh, da = vjp(g)
        return dh, da, None
    _, vjp = jax.vjp(f, h, attn_bank, rel_bias)
    return vjp(g)


_propagate_pallas.defvjp(_propagate_fwd, _propagate_bwd)


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
) -> jax.Array:
    """Drop-in replacement for the XLA ``relgat_propagate`` using the fused
    Pallas kernels over the block-padded layout."""
    rng_data = (
        jax.random.key_data(dropout_rng) if dropout_rng is not None else None
    )
    return _propagate_pallas(
        h, attn_bank, rel_bias, blocked, negative_slope, eps,
        attn_dropout_rate, rng_data, blocked.num_nodes,
    )
