"""NumPy/torch re-derivation of the reference semantics, for parity tests.

Implements the math of ``/root/reference`` (torch + torch-scatter) without
torch-scatter (plain ``index_add_`` / ``scatter_reduce``), so activation- and
loss-level parity of the TPU framework can be checked against the reference
semantics on this CPU image (torch-scatter is not installed here).

This file lives in tests only — it is a test oracle, not part of the
framework.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

STABLE_SOFTMAX_EPS = 1e-16  # reference layer.py:85


def scatter_add(src: torch.Tensor, index: torch.Tensor, dim_size: int):
    shape = (dim_size,) + src.shape[1:]
    out = torch.zeros(shape, dtype=src.dtype)
    return out.index_add_(0, index, src)


def scatter_max(src: torch.Tensor, index: torch.Tensor, dim_size: int):
    # torch-scatter fills empty segments with 0; only gathered per-edge so
    # the fill value is unobservable. We use -inf then zero empty segments.
    out = torch.full((dim_size,) + src.shape[1:], float("-inf"), dtype=src.dtype)
    out = out.scatter_reduce(
        0, index.unsqueeze(-1).expand_as(src) if src.dim() > 1 else index,
        src, reduce="amax", include_self=True,
    )
    out[out == float("-inf")] = 0.0
    return out


def relgat_layer_forward(
    node_emb: torch.Tensor,     # [N, in_dim]
    edge_index: torch.Tensor,   # [2, E]
    edge_type: torch.Tensor,    # [E]
    proj_weights: list,         # H x [out_dim, in_dim] torch Linear weights
    attn_vecs: list,            # H x [num_rel, out_dim]
    rel_bias,                   # [num_rel] or None
) -> torch.Tensor:
    """Reference ``core/model/layer.py:131-323`` semantics (eval mode)."""
    src, dst = edge_index
    n = node_emb.size(0)
    heads = len(proj_weights)

    proj_src = [node_emb @ w.t() for w in proj_weights]
    proj_src = [p[src] for p in proj_src]  # H x [E, out]

    attn = []
    for h in range(heads):
        rel_att = attn_vecs[h][edge_type]  # [E, out]
        e = (proj_src[h] * rel_att).sum(dim=-1)
        e = F.leaky_relu(e, negative_slope=0.2)
        max_per_dst = scatter_max(e, dst, n)
        e_shift = e - max_per_dst[dst]
        w = torch.exp(e_shift)
        denom = scatter_add(w, dst, n).clamp_min(STABLE_SOFTMAX_EPS)
        attn.append(w / denom[dst])

    out = [
        scatter_add(proj_src[h] * attn[h].unsqueeze(-1), dst, n)
        for h in range(heads)
    ]
    if rel_bias is not None:
        bias = scatter_add(rel_bias[edge_type], dst, n).unsqueeze(-1)
        out = [o + bias for o in out]
    return torch.cat(out, dim=-1)


def projection_head_forward(x, linears, ln_params):
    """Reference ``core/model/projection.py`` (eval): Linear->GELU->LN blocks
    then a final Linear. ``linears``: list of [out,in] weights; ``ln_params``:
    list of (scale, bias)."""
    y = x
    for i, w in enumerate(linears):
        y = y @ w.t()
        if i < len(ln_params):
            y = F.gelu(y)
            y = F.layer_norm(
                y, (y.shape[-1],), ln_params[i][0], ln_params[i][1], eps=1e-5
            )
    return y


def distmult_score(src, rel_emb, rel_ids, dst):
    r = rel_emb[rel_ids]
    return (src * r * dst).sum(-1)


def transe_score(src, rel_emb, rel_ids, dst, normalize=True):
    r = rel_emb[rel_ids]
    if normalize:
        src = F.normalize(src, p=2, dim=-1)
        r = F.normalize(r, p=2, dim=-1)
        dst = F.normalize(dst, p=2, dim=-1)
    return -torch.norm(src + r - dst, p=2, dim=-1)


def margin_loss(pos, neg, margin):
    return F.relu(margin + neg - pos.unsqueeze(1).expand_as(neg)).mean()


def self_adv_loss(pos, neg, alpha):
    with torch.no_grad():
        w = torch.softmax(alpha * neg, dim=1)
    return (
        -F.logsigmoid(pos).mean()
        - (w * F.logsigmoid(-neg)).sum(dim=1).mean()
    )


def cosine_loss(pred, target):
    pred_n = F.normalize(pred, p=2, dim=-1)
    tgt_n = F.normalize(target, p=2, dim=-1)
    return (1.0 - (pred_n * tgt_n).sum(dim=-1)).mean()


def compute_mrr_hits(pos_score, neg_score, ks):
    pos = torch.nan_to_num(pos_score, nan=-1e9, neginf=-1e9, posinf=1e9)
    neg = torch.nan_to_num(neg_score, nan=-1e9, neginf=-1e9, posinf=1e9)
    ranks = 1.0 + (neg >= pos.unsqueeze(1)).to(pos.dtype).sum(dim=1)
    mrr = (1.0 / ranks.clamp(min=1.0)).mean().item()
    hits = {k: (ranks <= float(k)).to(pos.dtype).mean().item() for k in ks}
    return mrr, hits


def lr_lambda(step, sched, total, warmup, lr_decay=1.0):
    """Reference ``core/lr.py:47-90``."""
    import math

    if step < warmup:
        base = float(step) / float(max(1, warmup))
    elif sched == "linear":
        base = max(0.0, float(total - step) / float(max(1, total - warmup)))
    elif sched == "cosine":
        progress = float(step - warmup) / float(max(1, total - warmup))
        base = 0.5 * (1.0 + math.cos(math.pi * min(1.0, max(0.0, progress))))
    else:
        base = 1.0
    if lr_decay != 1.0:
        base = base * (lr_decay ** max(0, step - warmup))
    return base


def random_graph(n=100, e=500, r=7, d=32, heads=3, out=16, seed=0):
    """Small random graph + reference-layer parameter set for fixtures."""
    g = np.random.default_rng(seed)
    edge_index = torch.tensor(
        np.stack([g.integers(0, n, e), g.integers(0, n, e)]), dtype=torch.long
    )
    edge_type = torch.tensor(g.integers(0, r, e), dtype=torch.long)
    node_emb = torch.tensor(g.standard_normal((n, d)), dtype=torch.float32)
    proj = [
        torch.tensor(g.standard_normal((out, d)) * 0.2, dtype=torch.float32)
        for _ in range(heads)
    ]
    attn = [
        torch.tensor(g.standard_normal((r, out)) * 0.2, dtype=torch.float32)
        for _ in range(heads)
    ]
    rel_bias = torch.tensor(g.standard_normal(r) * 0.1, dtype=torch.float32)
    return node_emb, edge_index, edge_type, proj, attn, rel_bias
