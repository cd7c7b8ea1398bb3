"""Export CLI: train a tiny checkpoint, then export representations and run
query expansion through the command-line surface (reference-format files)."""

import json
import os
import pickle

import numpy as np

from relgat_projector_tpu import cli, export
from relgat_projector_tpu.data.synthetic import generate_synthetic_kg


def test_export_cli_roundtrip(tmp_path, capsys):
    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=120, num_edges=800, num_rel=3, emb_dim=16, seed=0
    )
    # Write reference-format dataset files.
    nodes_p = os.path.join(tmp_path, "nodes.pkl")
    rels_p = os.path.join(tmp_path, "rels.json")
    trip_p = os.path.join(tmp_path, "triplets.json")
    with open(nodes_p, "wb") as f:
        pickle.dump({k: np.asarray(v) for k, v in node2emb.items()}, f)
    with open(rels_p, "w") as f:
        json.dump(rel2idx, f)
    with open(trip_p, "w") as f:
        json.dump([[s, d, r] for s, d, r in triplets], f)

    save_dir = os.path.join(tmp_path, "out")
    cli.main([
        "--nodes-embeddings-path", nodes_p,
        "--relations-mapping", rels_p,
        "--relations-triplets", trip_p,
        "--epochs", "1", "--batch-size", "64", "--gat-out-dim", "8",
        "--heads", "2", "--num-neg", "3", "--project-to-input-size",
        "--save-dir", save_dir, "--log-every-n-steps", "1000",
    ])
    ckpts = [d for d in os.listdir(save_dir) if d.startswith("relgat_")]
    assert ckpts

    out_npy = os.path.join(tmp_path, "repr.npy")
    export.main([
        "--checkpoint", os.path.join(save_dir, ckpts[0]),
        "--nodes-embeddings-path", nodes_p,
        "--relations-mapping", rels_p,
        "--relations-triplets", trip_p,
        "--out", out_npy,
        "--query-node", "5", "--query-relation", "rel_0", "--top-k", "4",
    ])
    repr_ = np.load(out_npy)
    assert repr_.shape == (120, 16)
    captured = capsys.readouterr().out
    payload = json.loads(captured[captured.rindex('{\n  "query_node"'):])
    assert payload["query_node"] == 5
    assert len(payload["top"]) == 4
