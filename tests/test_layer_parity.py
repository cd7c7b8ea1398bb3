"""Activation-level parity of the TPU RelGAT layer/model against a torch
re-derivation of the reference semantics (SURVEY.md §4 item 2; BASELINE
north star requires allclose activations)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from relgat_projector_tpu.config import ModelConfig
from relgat_projector_tpu.data.graph import build_graph, pad_node_embeddings
from relgat_projector_tpu.models.layer import apply_relgat_layer
from relgat_projector_tpu.models.model import init_model, single_gat_step

from tests import reference_impl as ref


def _to_jax_layer_params(proj, attn, rel_bias):
    return {
        "proj": jnp.asarray(np.stack([w.numpy().T for w in proj])),
        "attn": jnp.asarray(np.stack([a.numpy() for a in attn])),
        **(
            {"rel_bias": jnp.asarray(rel_bias.numpy())}
            if rel_bias is not None
            else {}
        ),
    }


def test_layer_forward_parity_with_reference():
    node_emb, edge_index, edge_type, proj, attn, rel_bias = ref.random_graph(
        n=100, e=500, r=7, d=32, heads=3, out=16, seed=0
    )
    want = ref.relgat_layer_forward(
        node_emb, edge_index, edge_type, proj, attn, rel_bias
    ).numpy()

    graph = build_graph(
        edge_index[0].numpy(), edge_index[1].numpy(), edge_type.numpy(),
        num_nodes=100,
    )
    x = jnp.asarray(pad_node_embeddings(node_emb.numpy(), graph.num_nodes))
    params = _to_jax_layer_params(proj, attn, rel_bias)
    got = np.asarray(apply_relgat_layer(params, x, graph, train=False))

    np.testing.assert_allclose(got[:100], want, rtol=1e-4, atol=1e-5)


def test_layer_parity_no_bias():
    node_emb, edge_index, edge_type, proj, attn, _ = ref.random_graph(seed=1)
    want = ref.relgat_layer_forward(
        node_emb, edge_index, edge_type, proj, attn, None
    ).numpy()
    graph = build_graph(
        edge_index[0].numpy(), edge_index[1].numpy(), edge_type.numpy(),
        num_nodes=100,
    )
    x = jnp.asarray(pad_node_embeddings(node_emb.numpy(), graph.num_nodes))
    params = _to_jax_layer_params(proj, attn, None)
    got = np.asarray(apply_relgat_layer(params, x, graph, train=False))
    np.testing.assert_allclose(got[:100], want, rtol=1e-4, atol=1e-5)


def test_isolated_nodes_produce_zero():
    """Nodes with no incoming edges must aggregate to exactly zero
    (reference scatter_add over an empty segment; SURVEY §4 property)."""
    node_emb, edge_index, edge_type, proj, attn, rel_bias = ref.random_graph(
        n=50, e=60, seed=2
    )
    # Direct all edges at nodes < 25; nodes >= 25 are isolated destinations.
    edge_index[1] = edge_index[1] % 25
    graph = build_graph(
        edge_index[0].numpy(), edge_index[1].numpy(), edge_type.numpy(),
        num_nodes=50,
    )
    x = jnp.asarray(pad_node_embeddings(node_emb.numpy(), graph.num_nodes))
    params = _to_jax_layer_params(proj, attn, rel_bias)
    got = np.asarray(apply_relgat_layer(params, x, graph, train=False))
    np.testing.assert_array_equal(got[25:50], 0.0)


def test_two_layer_model_parity():
    """Stacked layers with ELU between (reference model.py:56-73,283-287)."""
    torch.manual_seed(0)
    n, e, r, d, heads, out = 60, 300, 5, 24, 2, 8
    cfg = ModelConfig(
        in_dim=d, num_rel=r, gat_out_dim=out, gat_heads=heads,
        gat_num_layers=2, dropout=0.0, project_to_input_size=False,
        scorer_type="distmult",
    )
    params = init_model(jax.random.PRNGKey(0), cfg)

    g = np.random.default_rng(3)
    src = g.integers(0, n, e)
    dst = g.integers(0, n, e)
    et = g.integers(0, r, e)
    emb = g.standard_normal((n, d)).astype(np.float32)

    graph = build_graph(src, dst, et, num_nodes=n)
    x = jnp.asarray(pad_node_embeddings(emb, graph.num_nodes))
    got = np.asarray(single_gat_step(params, cfg, x, graph, train=False))

    # Torch oracle with the SAME (jax-initialized) weights.
    def layer_to_torch(lp):
        proj = [torch.tensor(np.asarray(lp["proj"][h]).T) for h in range(heads)]
        attn = [torch.tensor(np.asarray(lp["attn"][h])) for h in range(heads)]
        rb = torch.tensor(np.asarray(lp["rel_bias"]))
        return proj, attn, rb

    ei = torch.tensor(np.stack([src, dst]), dtype=torch.long)
    etype_t = torch.tensor(et, dtype=torch.long)
    xt = torch.tensor(emb)
    p0, a0, b0 = layer_to_torch(params["layers"][0])
    h1 = ref.relgat_layer_forward(xt, ei, etype_t, p0, a0, b0)
    h1 = torch.nn.functional.elu(h1)
    p1, a1, b1 = layer_to_torch(params["layers"][1])
    want = ref.relgat_layer_forward(h1, ei, etype_t, p1, a1, b1).numpy()

    np.testing.assert_allclose(got[:n], want, rtol=1e-4, atol=1e-5)
