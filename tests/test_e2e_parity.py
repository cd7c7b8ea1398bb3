"""End-to-end numerical parity: the FULL projection-path loss pipeline
(frozen embeddings -> stacked RelGAT -> projection head -> DistMult scoring
+ transform -> multi-objective loss) against a torch composition of the
reference semantics, with identical parameters, batch, and negatives.

This is the strongest single parity check: every component and their
composition (reference ``trainer:587-655`` + ``multi_objective_loss``)
agree to float32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from relgat_projector_tpu import losses
from relgat_projector_tpu.config import ModelConfig
from relgat_projector_tpu.data.graph import build_graph, pad_node_embeddings
from relgat_projector_tpu.models import scorer as sc
from relgat_projector_tpu.models.model import init_model, single_gat_step

from tests import reference_impl as ref


def test_full_projection_path_loss_parity():
    rng = np.random.default_rng(0)
    n, e, r, d, heads, out, b, k = 80, 400, 5, 24, 2, 8, 16, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    et = rng.integers(0, r, e)
    emb = rng.standard_normal((n, d)).astype(np.float32)

    cfg = ModelConfig(
        in_dim=d, num_rel=r, gat_out_dim=out, gat_heads=heads,
        gat_num_layers=2, dropout=0.0, project_to_input_size=True,
        projection_layers=2, projection_dropout=0.0, scorer_type="distmult",
    )
    params = init_model(jax.random.PRNGKey(0), cfg)

    graph = build_graph(src, dst, et, num_nodes=n)
    x_jax = jnp.asarray(pad_node_embeddings(emb, graph.num_nodes))

    bs = rng.integers(0, n, b)
    br = rng.integers(0, r, b)
    bd = rng.integers(0, n, b)
    neg = rng.integers(0, n, (b, k))

    # ---- our pipeline ----------------------------------------------------
    x = single_gat_step(params, cfg, x_jax, graph)
    sv = x[jnp.asarray(bs)]
    dv = x[jnp.asarray(bd)]
    nv = x[jnp.asarray(neg)]
    pos = sc.score_triplets(params["scorer"], "distmult", sv, jnp.asarray(br), dv)
    negs = sc.score_triplets(
        params["scorer"], "distmult", sv[:, None, :], jnp.asarray(br)[:, None], nv
    )
    tr = sc.transform(params["scorer"], "distmult", sv, jnp.asarray(br))
    got = losses.multi_objective_loss(
        pos_score=pos, neg_score=negs, transformed_src=tr, dst_vec=dv,
        neg_dst_vec=nv, relgat_weight=1.0, pos_cosine_weight=1.0,
        neg_cosine_weight=1.0, mse_weight=0.5, use_self_adv_neg=True,
        self_adv_alpha=0.7,
    )

    # ---- torch composition of the reference semantics --------------------
    ei = torch.tensor(np.stack([src, dst]), dtype=torch.long)
    ett = torch.tensor(et, dtype=torch.long)
    xt = torch.tensor(emb)
    hcur = xt
    for li in range(2):
        lp = params["layers"][li]
        proj = [torch.tensor(np.asarray(lp["proj"][h]).T) for h in range(heads)]
        attn = [torch.tensor(np.asarray(lp["attn"][h])) for h in range(heads)]
        rb = torch.tensor(np.asarray(lp["rel_bias"]))
        hcur = ref.relgat_layer_forward(hcur, ei, ett, proj, attn, rb)
        if li == 0:
            hcur = F.elu(hcur)
    pp = params["projection"]
    linears = [torch.tensor(np.asarray(w).T) for w in pp["linears"]]
    ln = [
        (torch.tensor(np.asarray(s)), torch.tensor(np.asarray(bb)))
        for s, bb in zip(pp["ln_scale"], pp["ln_bias"])
    ]
    xt_out = ref.projection_head_forward(hcur, linears, ln)

    rel_emb = torch.tensor(np.asarray(params["scorer"]["rel_emb"]))
    svt = xt_out[torch.tensor(bs)]
    dvt = xt_out[torch.tensor(bd)]
    nvt = xt_out[torch.tensor(neg)]
    brt = torch.tensor(br)
    post = ref.distmult_score(svt, rel_emb, brt, dvt)
    negt = (svt.unsqueeze(1) * rel_emb[brt].unsqueeze(1) * nvt).sum(-1)
    trt = svt * rel_emb[brt]

    rank = ref.self_adv_loss(post, negt, 0.7)
    cosp = ref.cosine_loss(trt, dvt)
    # reference neg-cos broadcast uses [K, B, D]
    cosn = ref.cosine_loss(trt, nvt.permute(1, 0, 2))
    mse = F.mse_loss(trt, dvt)
    want_total = (
        1.0 * rank + 1.0 * cosp + 1.0 * (1.0 - cosn) + 0.5 * mse
    ) / 3.5

    np.testing.assert_allclose(float(got.ranking), float(rank), rtol=1e-4)
    np.testing.assert_allclose(float(got.cosine_pos), float(cosp), rtol=1e-4)
    np.testing.assert_allclose(float(got.cosine_neg), float(cosn), rtol=1e-4)
    np.testing.assert_allclose(float(got.mse), float(mse), rtol=1e-4)
    np.testing.assert_allclose(float(got.total), float(want_total), rtol=1e-4)


def test_full_path_parity_transe():
    """Same pipeline with the TransE scorer (normalized)."""
    rng = np.random.default_rng(5)
    n, e, r, d, heads, out, b = 60, 300, 4, 16, 2, 8, 12
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    et = rng.integers(0, r, e)
    emb = rng.standard_normal((n, d)).astype(np.float32)

    cfg = ModelConfig(
        in_dim=d, num_rel=r, gat_out_dim=out, gat_heads=heads,
        gat_num_layers=1, dropout=0.0, project_to_input_size=True,
        projection_layers=1, scorer_type="transe",
    )
    params = init_model(jax.random.PRNGKey(1), cfg)
    graph = build_graph(src, dst, et, num_nodes=n)
    x_jax = jnp.asarray(pad_node_embeddings(emb, graph.num_nodes))

    bs, br, bd = rng.integers(0, n, b), rng.integers(0, r, b), rng.integers(0, n, b)

    x = single_gat_step(params, cfg, x_jax, graph)
    got = sc.score_triplets(
        params["scorer"], "transe",
        x[jnp.asarray(bs)], jnp.asarray(br), x[jnp.asarray(bd)],
    )

    lp = params["layers"][0]
    proj = [torch.tensor(np.asarray(lp["proj"][h]).T) for h in range(heads)]
    attn = [torch.tensor(np.asarray(lp["attn"][h])) for h in range(heads)]
    rb = torch.tensor(np.asarray(lp["rel_bias"]))
    ei = torch.tensor(np.stack([src, dst]), dtype=torch.long)
    hcur = ref.relgat_layer_forward(
        torch.tensor(emb), ei, torch.tensor(et, dtype=torch.long), proj, attn, rb
    )
    w = torch.tensor(np.asarray(params["projection"]["linears"][0]).T)
    xt_out = hcur @ w.t()
    rel_emb = torch.tensor(np.asarray(params["scorer"]["rel_emb"]))
    want = ref.transe_score(
        xt_out[torch.tensor(bs)], rel_emb, torch.tensor(br),
        xt_out[torch.tensor(bd)], normalize=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5
    )
