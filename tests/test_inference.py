"""Inference/export path: node-repr export, relation-path composition,
query expansion, inductive imputation (BASELINE config #4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from relgat_projector_tpu import inference
from relgat_projector_tpu.config import ModelConfig
from relgat_projector_tpu.data.graph import build_graph, pad_node_embeddings
from relgat_projector_tpu.models import scorer as sc
from relgat_projector_tpu.models.model import (
    init_model,
    single_gat_step,
    transform_from_vectors,
)


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    n, e, r, d = 80, 400, 5, 16
    graph = build_graph(
        rng.integers(0, n, e), rng.integers(0, n, e), rng.integers(0, r, e),
        num_nodes=n,
    )
    emb = rng.standard_normal((n, d)).astype(np.float32)
    x = jnp.asarray(pad_node_embeddings(emb, graph.num_nodes))
    cfg = ModelConfig(
        in_dim=d, num_rel=r, gat_out_dim=8, gat_heads=2, gat_num_layers=1,
        dropout=0.0, project_to_input_size=True, projection_layers=1,
    )
    params = init_model(jax.random.PRNGKey(0), cfg)
    return params, cfg, x, graph, n, d


def test_export_node_representations(tmp_path):
    params, cfg, x, graph, n, d = _setup()
    path = os.path.join(tmp_path, "repr.npy")
    out = inference.export_node_representations(params, cfg, x, graph, path)
    assert out.shape == (n, d)  # projected back to input dim
    loaded = np.load(path)
    np.testing.assert_array_equal(loaded, out)
    want = np.asarray(single_gat_step(params, cfg, x, graph))[:n]
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_relation_path_composition():
    params, cfg, x, graph, n, d = _setup()
    vecs = jnp.asarray(np.random.default_rng(1).standard_normal((4, d)),
                       jnp.float32)
    got = inference.compose_relation_path(params, cfg, vecs, [2, 0, 1])
    step1 = transform_from_vectors(params, cfg, vecs, jnp.asarray([2]))
    step2 = transform_from_vectors(params, cfg, step1, jnp.asarray([0]))
    want = transform_from_vectors(params, cfg, step2, jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_query_expansion_finds_transformed_target():
    params, cfg, x, graph, n, d = _setup()
    node_repr = jnp.asarray(
        inference.export_node_representations(params, cfg, x, graph)
    )
    # Query with node 7's own representation transformed by rel 3: the top
    # hit must be the node whose repr is closest to f_3(repr_7).
    idx, scores = inference.query_expansion(
        params, cfg, node_repr, node_repr[7], rel_id=3, top_k=5
    )
    assert idx.shape == (1, 5) and scores.shape == (1, 5)
    tq = transform_from_vectors(
        params, cfg, node_repr[7][None, :], jnp.asarray([3])
    )
    from relgat_projector_tpu.models.scorer import l2_normalize
    sims = np.asarray(l2_normalize(tq) @ l2_normalize(node_repr).T)[0]
    assert int(idx[0, 0]) == int(np.argmax(sims))
    assert np.all(np.diff(np.asarray(scores)[0]) <= 1e-6)  # sorted


def test_impute_embedding_mean_of_transforms():
    params, cfg, x, graph, n, d = _setup()
    node_repr = jnp.asarray(
        inference.export_node_representations(params, cfg, x, graph)
    )
    neighbors = [(3, 1), (10, 0), (20, 4)]
    got = inference.impute_embedding(params, cfg, node_repr, neighbors)
    parts = [
        sc.transform(params["scorer"], cfg.scorer_type,
                     node_repr[u][None, :], jnp.asarray([r]))[0]
        for u, r in neighbors
    ]
    want = np.mean(np.stack([np.asarray(p) for p in parts]), axis=0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    import pytest
    with pytest.raises(ValueError):
        inference.impute_embedding(params, cfg, node_repr, [])


def test_score_candidates_matches_scorer():
    params, cfg, x, graph, n, d = _setup()
    node_repr = jnp.asarray(
        inference.export_node_representations(params, cfg, x, graph)
    )
    cand = jnp.asarray([1, 5, 9], jnp.int32)
    got = inference.score_candidates(params, cfg, node_repr, 2, 3, cand)
    want = sc.score_triplets(
        params["scorer"], cfg.scorer_type,
        jnp.stack([node_repr[2]] * 3), jnp.asarray([3, 3, 3]),
        jnp.take(node_repr, cand, axis=0),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
