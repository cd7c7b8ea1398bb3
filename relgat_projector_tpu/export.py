"""Export / inference CLI.

Loads a trained checkpoint (the HF-style directory written by the trainer)
plus the dataset files, rebuilds the message-passing graph, and runs the
inference capabilities of ``inference.py``:

    # full node-representation matrix -> .npy
    python -m relgat_projector_tpu.export --checkpoint CKPT \
        --nodes-embeddings-path nodes.pkl --relations-mapping rels.json \
        --relations-triplets triplets.json --out repr.npy

    # query expansion: top-k nodes for (node, relation)
    python -m relgat_projector_tpu.export ... --query-node 123 \
        --query-relation hypernym --top-k 10

The graph is rebuilt from ALL provided triplets (inference-time semantics:
the reference reloads with caller-provided edge_index, ``model.py:217-272``).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="Checkpoint dir (config.json + relgat-model.msgpack)")
    p.add_argument("--nodes-embeddings-path", required=True)
    p.add_argument("--relations-mapping", required=True)
    p.add_argument("--relations-triplets", required=True)
    p.add_argument("--out", default=None,
                   help="Write the [N, D] node-representation matrix here "
                        "(.npy)")
    p.add_argument("--query-node", type=int, default=None,
                   help="Raw node id for query expansion")
    p.add_argument("--query-relation", type=str, default=None,
                   help="Relation name (or integer id) for query expansion")
    p.add_argument("--top-k", type=int, default=10)
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = get_args(argv)

    import jax.numpy as jnp

    from relgat_projector_tpu.data.dataset import RelGATData
    from relgat_projector_tpu.data.io import load_embeddings_and_edges
    from relgat_projector_tpu import inference
    from relgat_projector_tpu.models import model as model_lib

    node2emb, rel2idx, triplets = load_embeddings_and_edges(
        args.nodes_embeddings_path,
        args.relations_mapping,
        args.relations_triplets,
    )
    # All triplets feed the inference graph (train_ratio=1.0).
    data = RelGATData(node2emb, rel2idx, triplets, train_ratio=1.0)

    params, cfg = model_lib.load_from_pretrained(
        args.checkpoint,
        node_emb=data.node_emb[: data.num_nodes],
    )

    node_emb = jnp.asarray(data.node_emb)
    repr_ = inference.export_node_representations(
        params, cfg, node_emb, data.graph, args.out
    )
    print(f"node representations: {repr_.shape}"
          + (f" -> {args.out}" if args.out else ""))

    if args.query_node is not None and args.query_relation is not None:
        rel = args.query_relation
        rel_id = rel2idx[rel] if rel in rel2idx else int(rel)
        idx = data.id2idx[int(args.query_node)]
        ids, scores = inference.query_expansion(
            params, cfg, jnp.asarray(repr_), jnp.asarray(repr_[idx]),
            rel_id=rel_id, top_k=args.top_k,
        )
        inv = {v: k for k, v in data.id2idx.items()}
        hits = [
            {"node_id": int(inv[int(i)]), "score": float(s)}
            for i, s in zip(np.asarray(ids)[0], np.asarray(scores)[0])
        ]
        print(json.dumps(
            {"query_node": args.query_node, "relation": rel, "top": hits},
            indent=2,
        ))


if __name__ == "__main__":
    main()
