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


def test_torch_export_roundtrip_bitwise():
    """torch -> ours -> torch must be bitwise on every parameter
    (VERDICT r2 missing 1: interop becomes a round trip)."""
    from relgat_projector_tpu.interop import export_torch_state_dict

    sd_t, *_ = _make_reference_state_dict(n=40, in_dim=24, r=5)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params, cfg = import_torch_state_dict(sd, scorer_type="distmult")
    out_sd = export_torch_state_dict(
        params, cfg, node_emb=sd["node_emb_fixed"]
    )
    assert set(out_sd) == set(sd_t), (
        set(sd_t) ^ set(out_sd)
    )
    for k in sd_t:
        np.testing.assert_array_equal(
            out_sd[k].numpy(), sd_t[k].numpy(), err_msg=k
        )


def test_torch_export_roundtrip_single_layer_single_proj():
    """Round-trip the other key layout: 1 GAT layer (``gat_layer.`` prefix)
    + 1-layer projection (bare ``projection.net.weight``)."""
    from relgat_projector_tpu.interop import export_torch_state_dict

    sd_t, *_ = _make_reference_state_dict(
        n=30, in_dim=16, out_dim=8, heads=3, r=4, layers=1, proj_layers=1
    )
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params, cfg = import_torch_state_dict(sd, scorer_type="transe")
    assert cfg.gat_num_layers == 1 and cfg.scorer_type == "transe"
    out_sd = export_torch_state_dict(
        params, cfg, node_emb=sd["node_emb_fixed"]
    )
    assert set(out_sd) == set(sd_t)
    for k in sd_t:
        np.testing.assert_array_equal(out_sd[k].numpy(), sd_t[k].numpy(),
                                      err_msg=k)


def test_exported_state_dict_forward_parity(tmp_path):
    """A model trained HERE, exported via export_torch_checkpoint_dir, must
    produce the same node representations when the exported tensors drive
    the torch oracle (tests/reference_impl.py) — i.e. the reference
    ecosystem can serve our checkpoints."""
    import jax.numpy as jnp

    from relgat_projector_tpu.config import ModelConfig
    from relgat_projector_tpu.data.graph import (
        build_graph,
        pad_node_embeddings,
    )
    from relgat_projector_tpu.interop import export_torch_checkpoint_dir
    from relgat_projector_tpu.models.model import (
        init_model,
        save_pretrained,
        single_gat_step,
    )

    rng = np.random.default_rng(7)
    n, e, r, in_dim = 70, 350, 4, 20
    cfg = ModelConfig(
        in_dim=in_dim, num_rel=r, gat_out_dim=8, gat_heads=2,
        gat_num_layers=2, dropout=0.0, project_to_input_size=True,
        projection_layers=2, projection_dropout=0.0,
    )
    params = init_model(jax.random.PRNGKey(3), cfg)
    ours_dir = tmp_path / "ours"
    save_pretrained(str(ours_dir), params, cfg)

    emb = rng.standard_normal((n, in_dim)).astype(np.float32)
    torch_dir = tmp_path / "torch"
    export_torch_checkpoint_dir(str(ours_dir), str(torch_dir), node_emb=emb)
    assert (torch_dir / "relgat-model.pt").is_file()
    assert (torch_dir / "pytorch_model.bin").is_file()
    assert (torch_dir / "config.json").is_file()
    ref_cfg = json.loads((torch_dir / "config.json").read_text())
    assert ref_cfg["input_dim"] == in_dim
    assert ref_cfg["gat_num_layers"] == 2

    sd = torch.load(torch_dir / "relgat-model.pt", weights_only=True)
    np.testing.assert_array_equal(sd["node_emb_fixed"].numpy(), emb)

    # Drive the torch oracle with the EXPORTED tensors.
    torch_layers = []
    for li in range(2):
        pre = f"gat_layers.{li}."
        proj = [sd[f"{pre}proj.{h}.weight"] for h in range(2)]
        attn = [sd[f"{pre}attn_vec.{h}"] for h in range(2)]
        torch_layers.append((proj, attn, sd[f"{pre}rel_bias"]))
    proj_head = (
        [sd["projection.net.0.weight"], sd["projection.net.3.weight"]],
        [(sd["projection.net.2.weight"], sd["projection.net.2.bias"])],
    )

    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    et = rng.integers(0, r, e).astype(np.int64)
    want = _oracle_node_repr(
        torch.tensor(emb), torch.tensor(np.stack([src, dst])),
        torch.tensor(et), torch_layers, proj_head,
    ).numpy()

    graph = build_graph(src, dst, et, num_nodes=n)
    got = single_gat_step(
        params, cfg, jnp.asarray(pad_node_embeddings(emb, graph.num_nodes)),
        graph,
    )
    np.testing.assert_allclose(np.asarray(got)[:n], want, rtol=1e-4,
                               atol=1e-5)


def test_export_torch_cli(tmp_path):
    """relgat-projector-export-torch entry point writes the reference
    artifact set from a trained checkpoint dir."""
    import pickle

    from relgat_projector_tpu.config import ModelConfig
    from relgat_projector_tpu.interop import main_export
    from relgat_projector_tpu.models.model import init_model, save_pretrained

    cfg = ModelConfig(in_dim=12, num_rel=3, gat_out_dim=6, gat_heads=2,
                      gat_num_layers=1, project_to_input_size=True,
                      projection_layers=1)
    params = init_model(jax.random.PRNGKey(0), cfg)
    ours = tmp_path / "ckpt"
    save_pretrained(str(ours), params, cfg)
    emb = {i: np.ones(12, np.float32) * i for i in range(9)}
    emb_path = tmp_path / "emb.pkl"
    with open(emb_path, "wb") as f:
        pickle.dump(emb, f)

    out = tmp_path / "torch_out"
    main_export(["--checkpoint", str(ours), "--out", str(out),
                 "--nodes-embeddings-path", str(emb_path)])
    sd = torch.load(out / "relgat-model.pt", weights_only=True)
    assert sd["node_emb_fixed"].shape == (9, 12)
    assert "gat_layer.proj.0.weight" in sd
    assert "projection.net.weight" in sd
    assert "scorer.rel_emb.weight" in sd


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
