"""Torch-checkpoint importer (interop.py): round-trip a synthetic reference
state_dict (exact reference key layout, ``handlers/storage.py:45-56`` /
``core/model/model.py:252-271``) and check activation-level parity vs the
torch oracle, plus the export CLI on a converted checkpoint."""

import json
import os

import numpy as np
import torch
import jax
import jax.numpy as jnp

from relgat_projector_tpu.interop import (
    import_torch_checkpoint_dir,
    import_torch_state_dict,
)
from tests import reference_impl as R


def _make_reference_state_dict(seed=0, n=80, in_dim=24, out_dim=8, heads=2,
                               r=5, layers=2, proj_layers=2):
    torch.manual_seed(seed)
    sd = {}
    dims = [in_dim] + [heads * out_dim] * (layers - 1)
    torch_layers = []
    for li in range(layers):
        proj = [torch.randn(out_dim, dims[li]) * 0.2 for _ in range(heads)]
        attn = [torch.randn(r, out_dim) * 0.2 for _ in range(heads)]
        bias = torch.randn(r) * 0.1
        pre = "gat_layer." if layers == 1 else f"gat_layers.{li}."
        for h in range(heads):
            sd[f"{pre}proj.{h}.weight"] = proj[h]
            sd[f"{pre}attn_vec.{h}"] = attn[h]
        sd[f"{pre}rel_bias"] = bias
        torch_layers.append((proj, attn, bias))

    concat = heads * out_dim
    lin0 = torch.randn(concat, concat) * 0.1   # [hidden=concat, in=concat]
    ln_w = torch.ones(concat)
    ln_b = torch.zeros(concat) + 0.01
    lin1 = torch.randn(in_dim, concat) * 0.1
    if proj_layers >= 2:
        sd["projection.net.0.weight"] = lin0
        sd["projection.net.2.weight"] = ln_w
        sd["projection.net.2.bias"] = ln_b
        sd["projection.net.3.weight"] = lin1
        proj_head = ([lin0, lin1], [(ln_w, ln_b)])
    else:
        sd["projection.net.weight"] = lin1
        proj_head = ([lin1], [])

    rel_emb = torch.randn(r, in_dim) * 0.2
    sd["scorer.rel_emb.weight"] = rel_emb
    sd["node_emb_fixed"] = torch.randn(n, in_dim)  # buffer (ignored)
    return sd, torch_layers, proj_head, rel_emb


def _oracle_node_repr(node_emb_t, edge_index, edge_type, torch_layers,
                      proj_head):
    x = node_emb_t
    for li, (proj, attn, bias) in enumerate(torch_layers):
        x = R.relgat_layer_forward(x, edge_index, edge_type, proj, attn,
                                   bias)
        if len(torch_layers) > 1 and li < len(torch_layers) - 1:
            x = torch.nn.functional.elu(x)
    return R.projection_head_forward(x, proj_head[0], proj_head[1])


def test_import_state_dict_activation_parity():
    rng = np.random.default_rng(0)
    n, e, r, in_dim = 80, 400, 5, 24
    sd_t, torch_layers, proj_head, rel_emb = _make_reference_state_dict(
        n=n, in_dim=in_dim, r=r
    )
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params, cfg = import_torch_state_dict(sd, scorer_type="distmult")
    assert cfg.gat_num_layers == 2
    assert cfg.gat_heads == 2
    assert cfg.project_to_input_size
    assert cfg.in_dim == in_dim

    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    et = rng.integers(0, r, e).astype(np.int64)
    emb = rng.standard_normal((n, in_dim)).astype(np.float32)

    want = _oracle_node_repr(
        torch.tensor(emb),
        torch.tensor(np.stack([src, dst])),
        torch.tensor(et),
        torch_layers,
        proj_head,
    ).numpy()

    from relgat_projector_tpu.data.graph import build_graph, pad_node_embeddings
    from relgat_projector_tpu.models.model import single_gat_step

    graph = build_graph(src, dst, et, num_nodes=n)
    x = single_gat_step(
        params, cfg, jnp.asarray(pad_node_embeddings(emb, graph.num_nodes)),
        graph,
    )
    np.testing.assert_allclose(
        np.asarray(x)[:n], want, rtol=1e-4, atol=1e-5
    )

    # Scorer parity on some triplets.
    from relgat_projector_tpu.models import scorer as SC

    b = 32
    bs = rng.integers(0, n, b)
    br = rng.integers(0, r, b)
    bd = rng.integers(0, n, b)
    want_s = R.distmult_score(
        torch.tensor(want[bs]), rel_emb, torch.tensor(br),
        torch.tensor(want[bd]),
    ).numpy()
    got_s = SC.score_triplets(
        params["scorer"], "distmult",
        jnp.asarray(want[bs]), jnp.asarray(br), jnp.asarray(want[bd]),
    )
    np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-4,
                               atol=1e-5)


def test_import_checkpoint_dir_and_export_cli(tmp_path):
    """Full flow: reference checkpoint dir -> converted dir ->
    load_from_pretrained -> export/query CLI."""
    n, in_dim, r = 60, 16, 4
    sd_t, *_ = _make_reference_state_dict(
        n=n, in_dim=in_dim, r=r, out_dim=8, heads=2
    )
    ckpt = tmp_path / "ref_ckpt"
    ckpt.mkdir()
    torch.save(sd_t, ckpt / "relgat-model.pt")
    rel2idx = {f"rel_{i}": i for i in range(r)}
    (ckpt / "training-config.json").write_text(
        json.dumps({"scorer": "distmult"})
    )
    (ckpt / "relations-map.json").write_text(json.dumps(rel2idx))

    out = tmp_path / "converted"
    params, cfg = import_torch_checkpoint_dir(str(ckpt), str(out))
    assert (out / "config.json").is_file()
    assert (out / "relgat-model.msgpack").is_file()
    assert (out / "relations-map.json").is_file()

    from relgat_projector_tpu.models.model import load_from_pretrained

    rng = np.random.default_rng(1)
    emb = rng.standard_normal((n, in_dim)).astype(np.float32)
    params2, cfg2 = load_from_pretrained(str(out), node_emb=emb)
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(params2),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Export/query CLI on the converted checkpoint (ingestion formats of
    # handlers/models/relgat.py:11-41).
    import pickle

    from relgat_projector_tpu import export as export_cli

    emb_path = tmp_path / "emb.pkl"
    with open(emb_path, "wb") as f:
        pickle.dump({i: emb[i] for i in range(n)}, f)
    rel_path = tmp_path / "rels.json"
    rel_path.write_text(json.dumps(rel2idx))
    tri = [
        [int(rng.integers(0, n)), int(rng.integers(0, n)), f"rel_{i % r}"]
        for i in range(200)
    ]
    tri_path = tmp_path / "triplets.json"
    tri_path.write_text(json.dumps(tri))

    out_npz = tmp_path / "repr.npy"
    export_cli.main([
        "--checkpoint", str(out),
        "--nodes-embeddings-path", str(emb_path),
        "--relations-mapping", str(rel_path),
        "--relations-triplets", str(tri_path),
        "--out", str(out_npz),
        "--query-node", "3", "--query-relation", "rel_1", "--top-k", "5",
    ])
    assert out_npz.is_file()
