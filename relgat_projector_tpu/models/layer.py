"""RelGAT layer — multi-head relational graph attention, heads vectorized.

TPU-first redesign of the reference layer (``core/model/layer.py:9-323``):
the reference loops over heads in Python, issuing 4 torch-scatter launches
per head; here all heads run in one einsum + one fused propagate op, so the
MXU sees one large ``[N, in] x [in, H*F]`` matmul and the segment ops are
head-vectorized ``[E, H]`` / ``[E, H, F]`` tensors.

Parameter layout:
- ``proj``     ``[H, in_dim, out_dim]`` — per-head projection (Xavier-uniform,
  parity with ``layer.py:108-110,126-127``; slice ``[h]`` equals the torch
  weight transposed).
- ``attn``     ``[H, num_rel, out_dim]`` — per-head per-relation attention
  vectors (Xavier-uniform, ``layer.py:113-115,128-129``).
- ``rel_bias`` ``[num_rel]`` — optional scalar relation bias, zero-init
  (``layer.py:118-121``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from relgat_projector_tpu.data.graph import GraphData
from relgat_projector_tpu.models.initializers import xavier_uniform
from relgat_projector_tpu.ops.relgat_ops import relgat_propagate


def init_relgat_layer(
    rng: jax.Array,
    in_dim: int,
    out_dim: int,
    num_rel: int,
    heads: int,
    *,
    use_bias: bool = True,
    dtype=jnp.float32,
) -> Dict[str, jax.Array]:
    k_proj, k_attn = jax.random.split(rng)
    # Per-head Xavier bounds depend only on (in_dim, out_dim) / (num_rel,
    # out_dim), identical for every head, so one batched draw matches the
    # per-head torch init distribution.
    params = {
        "proj": xavier_uniform(
            k_proj, (heads, in_dim, out_dim), fan_in=in_dim, fan_out=out_dim,
            dtype=dtype,
        ),
        "attn": xavier_uniform(
            k_attn, (heads, num_rel, out_dim), fan_in=out_dim, fan_out=num_rel,
            dtype=dtype,
        ),
    }
    if use_bias:
        params["rel_bias"] = jnp.zeros((num_rel,), dtype=dtype)
    return params


def apply_relgat_layer(
    params: Dict[str, jax.Array],
    x: jax.Array,              # [N, in_dim]
    graph: GraphData,
    *,
    dropout_rate: float = 0.0,
    attn_dropout_rate: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
    compute_dtype=jnp.float32,
    kernel_precision: str = "highest",
) -> jax.Array:
    """One message-passing step; returns ``[N, heads * out_dim]``."""
    heads = params["proj"].shape[0]
    out_dim = params["proj"].shape[2]
    n = x.shape[0]

    # Project once for all heads: [N, in] x [in, H*F] on the MXU.
    w = params["proj"].astype(compute_dtype)
    h = jnp.einsum(
        "ni,hio->nho", x.astype(compute_dtype), w,
        preferred_element_type=jnp.float32,
    )  # [N, H, F] fp32 accumulation

    attn_rng = None
    out_rng = None
    if train and rng is not None:
        attn_rng, out_rng = jax.random.split(rng)

    agg = relgat_propagate(
        h,
        params["attn"].astype(jnp.float32),
        params.get("rel_bias"),
        graph.src,
        graph.dst,
        graph.etype,
        num_nodes=graph.num_nodes,
        attn_dropout_rate=attn_dropout_rate if train else 0.0,
        dropout_rng=attn_rng,
        edges_sorted_by_dst=graph.sorted_by_dst,
        use_pallas=use_pallas,
        blocked=graph.blocked,
        kernel_precision=kernel_precision,
    )  # [N, H, F]

    out = agg.reshape(n, heads * out_dim)

    # Output dropout on the concatenated heads (reference ``layer.py:322``).
    if train and dropout_rate > 0.0 and out_rng is not None:
        keep = jax.random.bernoulli(out_rng, 1.0 - dropout_rate, out.shape)
        out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)
    return out
