"""Fused RelGAT message-passing op (SDDMM -> segment-softmax -> SpMM).

This is the hot op of the whole framework: the reference computes it with a
per-head Python loop over four torch-scatter launches per head
(``core/model/layer.py:220-318``); here it is one head-vectorized op with an
XLA-baseline implementation (this file) and a fused Pallas TPU kernel
(``ops/pallas``) selected via ``use_pallas``.

Semantics (parity with reference ``layer.py:214-323``):
  1. gather projected source rows at edge sources,
  2. per-edge score ``e = LeakyReLU_0.2(sum(proj_src * attn[rel], -1))``,
  3. stable segment softmax per destination (denominator clamped at 1e-16),
  4. optional dropout on the attention weights,
  5. weighted scatter-add of messages per destination,
  6. optional per-relation scalar bias, scatter-summed per destination and
     added to every head/feature after aggregation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from relgat_projector_tpu.ops.segment import (
    STABLE_SOFTMAX_EPS,
    segment_softmax,
    segment_sum,
)


def relgat_propagate(
    h: jax.Array,              # [N, H, F] projected node features
    attn_bank: jax.Array,      # [H, R, F] per-head per-relation attention vectors
    rel_bias: Optional[jax.Array],  # [R] or None
    src: jax.Array,            # [E] int32 edge sources
    dst: jax.Array,            # [E] int32 edge destinations
    etype: jax.Array,          # [E] int32 relation ids
    *,
    num_nodes: int,
    negative_slope: float = 0.2,
    eps: float = STABLE_SOFTMAX_EPS,
    attn_dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    edges_sorted_by_dst: bool = False,
    edge_mask: Optional[jax.Array] = None,
    use_pallas: bool = False,
    blocked=None,
    kernel_precision: str = "highest",
    dropout_edge_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Return aggregated messages ``[N, H, F]``.

    Padded edges must either point ``dst`` at a padded node row (>= the
    number of real nodes) or carry ``edge_mask = 0`` (masked edges get
    ``-inf`` logits, so zero softmax weight and zero contribution); static
    shapes throughout (TPU requirement).
    """
    if blocked is not None:
        from relgat_projector_tpu.data.blocked import ScannedBlockedGraph
        from relgat_projector_tpu.parallel.halo import (
            HaloGraph,
            halo_propagate,
        )

        if isinstance(blocked, ScannedBlockedGraph):
            # Mesh-less segment stacks: lax.scan the fused kernels over
            # dst-segments (fwd) / src-segments (bwd) on ONE device —
            # bounds the per-edge gather memory for huge graphs.
            from relgat_projector_tpu.ops.pallas.kernels import (
                relgat_propagate_pallas_scanned,
            )

            return relgat_propagate_pallas_scanned(
                h,
                attn_bank,
                rel_bias,
                blocked,
                negative_slope=negative_slope,
                eps=eps,
                attn_dropout_rate=attn_dropout_rate,
                dropout_rng=dropout_rng,
                kernel_precision=kernel_precision,
            )

        if isinstance(blocked, HaloGraph):
            # Boundary-only halo exchange over the graph-sharded mesh;
            # works for both the XLA and the fused-Pallas local propagate.
            return halo_propagate(
                h,
                attn_bank,
                rel_bias,
                blocked,
                use_pallas=use_pallas,
                negative_slope=negative_slope,
                eps=eps,
                attn_dropout_rate=attn_dropout_rate,
                dropout_rng=dropout_rng,
                kernel_precision=kernel_precision,
            )

    if use_pallas and blocked is not None:
        from relgat_projector_tpu.parallel.pallas_sharded import (
            ShardedBlockedGraph,
            pallas_sharded_propagate,
        )

        if isinstance(blocked, ShardedBlockedGraph):
            # Fused kernels under the graph-sharded mesh: per-device blocked
            # layouts inside shard_map (one dst range per device).
            return pallas_sharded_propagate(
                h,
                attn_bank,
                rel_bias,
                blocked,
                negative_slope=negative_slope,
                eps=eps,
                attn_dropout_rate=attn_dropout_rate,
                dropout_rng=dropout_rng,
                kernel_precision=kernel_precision,
            )

        from relgat_projector_tpu.ops.pallas import relgat_propagate_pallas

        return relgat_propagate_pallas(
            h,
            attn_bank,
            rel_bias,
            blocked,
            negative_slope=negative_slope,
            eps=eps,
            attn_dropout_rate=attn_dropout_rate,
            dropout_rng=dropout_rng,
            kernel_precision=kernel_precision,
        )

    return _xla_propagate(
        h, attn_bank, rel_bias, src, dst, etype,
        num_nodes=num_nodes,
        negative_slope=negative_slope,
        eps=eps,
        attn_dropout_rate=attn_dropout_rate,
        dropout_rng=dropout_rng,
        edges_sorted_by_dst=edges_sorted_by_dst,
        edge_mask=edge_mask,
        dropout_edge_ids=dropout_edge_ids,
    )


def _xla_propagate(
    h, attn_bank, rel_bias, src, dst, etype, *,
    num_nodes, negative_slope, eps, attn_dropout_rate, dropout_rng,
    edges_sorted_by_dst, edge_mask, dropout_edge_ids,
):
    proj_src = jnp.take(h, src, axis=0, mode="clip")       # [E, H, F]
    rel_att = jnp.take(attn_bank, etype, axis=1, mode="clip")  # [H, E, F]
    rel_att = jnp.swapaxes(rel_att, 0, 1)                  # [E, H, F]

    # SDDMM-like per-edge attention logits (reference ``layer.py:227-234``).
    e = jnp.sum(proj_src * rel_att, axis=-1)               # [E, H]
    e = jax.nn.leaky_relu(e, negative_slope=negative_slope)
    if edge_mask is not None:
        e = jnp.where(edge_mask[:, None] > 0, e, -jnp.inf)

    alpha = segment_softmax(
        e,
        dst,
        num_nodes,
        eps=eps,
        indices_are_sorted=edges_sorted_by_dst,
    )                                                      # [E, H]

    # Optional dropout on normalized attention weights (``layer.py:296-297``).
    # The mask is a deterministic hash of (seed, canonical edge id, head)
    # (``ops/dropout.py``) so the fused Pallas forward AND its hand-written
    # backward replay the identical mask from the seed alone.
    if attn_dropout_rate > 0.0 and dropout_rng is not None:
        from relgat_projector_tpu.ops.dropout import (
            edge_keep_mask_all_heads,
            seed_from_key,
        )

        eids = (
            dropout_edge_ids
            if dropout_edge_ids is not None
            else jnp.arange(src.shape[0], dtype=jnp.int32)
        )
        keep = edge_keep_mask_all_heads(
            eids, alpha.shape[1], seed_from_key(dropout_rng),
            attn_dropout_rate,
        )
        alpha = alpha * keep / (1.0 - attn_dropout_rate)

    msgs = proj_src * alpha[..., None]                     # [E, H, F]
    out = segment_sum(
        msgs, dst, num_nodes, indices_are_sorted=edges_sorted_by_dst
    )                                                      # [N, H, F]

    # Per-relation scalar bias, scatter-summed per dst AFTER aggregation and
    # broadcast over heads and features (``layer.py:313-318``).
    if rel_bias is not None:
        bias_e = jnp.take(rel_bias, etype, mode="clip")    # [E]
        if edge_mask is not None:
            bias_e = bias_e * edge_mask
        bias_n = segment_sum(
            bias_e, dst, num_nodes, indices_are_sorted=edges_sorted_by_dst
        )                                                  # [N]
        out = out + bias_n[:, None, None]

    return out


def relgat_propagate_partial(
    h: jax.Array,              # [N_src, H, F] gather space for THIS subset
    attn_bank: jax.Array,      # [H, R, F]
    rel_bias: Optional[jax.Array],
    src: jax.Array,            # [E_sub] int32 (ids into h's rows)
    dst: jax.Array,            # [E_sub] int32 (local output rows)
    etype: jax.Array,          # [E_sub] int32
    *,
    num_out: int,
    negative_slope: float = 0.2,
    attn_dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    edge_mask: Optional[jax.Array] = None,
    edges_sorted_by_dst: bool = False,
    dropout_edge_ids: Optional[jax.Array] = None,
):
    """UN-normalized propagate partials over an edge SUBSET, for
    flash-style merging across subsets (``merge_propagate_partials``).

    The overlapped halo exchange (``parallel/halo.py``) splits each
    shard's edges into local-source and remote-source subsets so the
    boundary ``all_to_all`` can hide behind the local subset's
    aggregation; per (dst row, head) this returns the online-softmax
    state instead of the normalized output:

    - ``m``   ``[num_out, H]``  true per-dst max logit (-inf if none),
    - ``l``   ``[num_out, H]``  sum of ``exp(e - m)`` (un-dropped),
    - ``acc`` ``[num_out, H, F]`` sum of ``exp(e - m) * keep * msg``,
    - ``bias`` ``[num_out]``   per-relation scalar bias sum.

    ``dropout_edge_ids`` must carry CANONICAL edge ids so the masks match
    the unsplit propagate for the same seed (``ops/dropout.py``).
    """
    proj_src = jnp.take(h, src, axis=0, mode="clip")       # [E, H, F]
    rel_att = jnp.swapaxes(
        jnp.take(attn_bank, etype, axis=1, mode="clip"), 0, 1
    )                                                      # [E, H, F]
    e = jnp.sum(proj_src * rel_att, axis=-1)               # [E, H]
    e = jax.nn.leaky_relu(e, negative_slope=negative_slope)
    if edge_mask is not None:
        e = jnp.where(edge_mask[:, None] > 0, e, -jnp.inf)

    from relgat_projector_tpu.ops.segment import segment_max

    m = segment_max(
        e, dst, num_out, indices_are_sorted=edges_sorted_by_dst
    )                                                      # [num_out, H]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.exp(e - m_safe[dst])                           # [E, H]; 0 if masked
    l = segment_sum(
        w, dst, num_out, indices_are_sorted=edges_sorted_by_dst
    )                                                      # [num_out, H]

    w_acc = w
    if attn_dropout_rate > 0.0 and dropout_rng is not None:
        from relgat_projector_tpu.ops.dropout import (
            edge_keep_mask_all_heads,
            seed_from_key,
        )

        eids = (
            dropout_edge_ids
            if dropout_edge_ids is not None
            else jnp.arange(src.shape[0], dtype=jnp.int32)
        )
        keep = edge_keep_mask_all_heads(
            eids, e.shape[1], seed_from_key(dropout_rng), attn_dropout_rate
        )
        w_acc = w * keep / (1.0 - attn_dropout_rate)

    acc = segment_sum(
        proj_src * w_acc[..., None], dst, num_out,
        indices_are_sorted=edges_sorted_by_dst,
    )                                                      # [num_out, H, F]

    if rel_bias is not None:
        bias_e = jnp.take(rel_bias, etype, mode="clip")
        if edge_mask is not None:
            bias_e = bias_e * edge_mask
        bias_n = segment_sum(
            bias_e, dst, num_out, indices_are_sorted=edges_sorted_by_dst
        )
    else:
        bias_n = jnp.zeros((num_out,), jnp.float32)
    return acc, m, l, bias_n


def merge_propagate_partials(
    parts,
    *,
    eps: float = STABLE_SOFTMAX_EPS,
) -> jax.Array:
    """Merge ``(acc, m, l, bias)`` partials from disjoint edge subsets of
    the same destination rows into the normalized aggregate ``[N, H, F]``.

    Algebraically identical to one softmax over the union (flash-attention
    state merging): rescale each subset's ``l``/``acc`` by
    ``exp(m_subset - m_global)`` and normalize once, with the reference's
    ``1e-16`` denominator clamp (``layer.py:291``) applied at the end."""
    ms = [p[1] for p in parts]
    m = ms[0]
    for m_p in ms[1:]:
        m = jnp.maximum(m, m_p)
    m_fin = jnp.where(jnp.isfinite(m), m, 0.0)

    l_tot = None
    acc_tot = None
    bias_tot = None
    for acc_p, m_p, l_p, bias_p in parts:
        s = jnp.where(jnp.isfinite(m_p), jnp.exp(m_p - m_fin), 0.0)
        l_c = l_p * s
        acc_c = acc_p * s[..., None]
        l_tot = l_c if l_tot is None else l_tot + l_c
        acc_tot = acc_c if acc_tot is None else acc_tot + acc_c
        bias_tot = bias_p if bias_tot is None else bias_tot + bias_p
    out = acc_tot / jnp.maximum(l_tot, eps)[..., None]
    return out + bias_tot[:, None, None]
