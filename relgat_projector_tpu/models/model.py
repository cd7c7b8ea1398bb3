"""RelGAT model: stacked layers + optional projection head + scorer.

Functional redesign of reference ``core/model/model.py:13-292``:
parameters are a pytree, the frozen node embeddings and graph are explicit
arguments (device-resident, shardable), and every apply function is pure and
jit-compatible.

Semantics preserved:
- single layer: no inter-layer activation; stacked layers: ELU between
  layers (not after the last), with ``in_dim -> heads * out_dim`` after the
  first (``model.py:44-73``),
- optional projection head back to the input dim, after which the scorer
  operates in input space (``model.py:75-87``),
- ``single_gat_step`` computes representations for ALL nodes; triplet
  scoring gathers endpoints out of that full matrix (``model.py:274-292``,
  ``:99-142``) — the defining full-graph-recompute trait,
- inference helpers ``get_node_repr`` / ``transform`` /
  ``transform_from_vectors`` incl. single-relation broadcast
  (``model.py:144-186``),
- HF-style ``save_pretrained`` / ``load_from_pretrained`` with input-dim
  validation (``model.py:196-272``; the reference's ``save_pretrained`` is
  broken via an unset ``self._config`` — fixed here).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from relgat_projector_tpu.config import Defaults, ModelConfig
from relgat_projector_tpu.data.graph import GraphData
from relgat_projector_tpu.models.layer import (
    apply_relgat_layer,
    init_relgat_layer,
)
from relgat_projector_tpu.models.projection import (
    apply_projection_head,
    init_projection_head,
)
from relgat_projector_tpu.models import scorer as scorer_mod

Params = Dict[str, Any]


def init_model(rng: jax.Array, cfg: ModelConfig) -> Params:
    dtype = jnp.dtype(cfg.param_dtype)
    k_layers, k_proj, k_scorer = jax.random.split(rng, 3)

    layers = []
    in_dim = cfg.in_dim
    layer_keys = jax.random.split(k_layers, cfg.gat_num_layers)
    for li in range(cfg.gat_num_layers):
        layers.append(
            init_relgat_layer(
                layer_keys[li],
                in_dim=in_dim,
                out_dim=cfg.gat_out_dim,
                num_rel=cfg.num_rel,
                heads=cfg.gat_heads,
                use_bias=cfg.use_rel_bias,
                dtype=dtype,
            )
        )
        in_dim = cfg.gat_concat_dim

    params: Params = {"layers": layers}
    if cfg.project_to_input_size:
        params["projection"] = init_projection_head(
            k_proj,
            in_dim=cfg.gat_concat_dim,
            out_dim=cfg.in_dim,
            num_layers=cfg.projection_layers,
            hidden_dim=cfg.projection_hidden_dim,
            dtype=dtype,
        )
    params["scorer"] = scorer_mod.init_scorer(
        k_scorer, cfg.num_rel, cfg.scorer_dim, dtype=dtype
    )
    return params


def single_gat_step(
    params: Params,
    cfg: ModelConfig,
    node_emb: jax.Array,   # [N_pad, in_dim] frozen
    graph: GraphData,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Node representations for ALL nodes ``[N_pad, scorer_dim]``
    (reference ``model.py:274-292``)."""
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    num_layers = cfg.gat_num_layers

    keys = (
        jax.random.split(rng, num_layers + 1)
        if (train and rng is not None)
        else [None] * (num_layers + 1)
    )

    def layer_fn(layer_params, x_in, key):
        return apply_relgat_layer(
            layer_params,
            x_in,
            graph,
            dropout_rate=cfg.dropout,
            attn_dropout_rate=cfg.rel_attn_dropout,
            train=train,
            rng=key,
            use_pallas=cfg.use_pallas,
            compute_dtype=compute_dtype,
            kernel_precision=cfg.kernel_precision,
        )

    if cfg.remat:
        # Full-graph backward keeps all-N activations per layer alive
        # (SURVEY.md §7.3); remat trades recompute for that memory.
        layer_fn = jax.checkpoint(layer_fn)

    x = node_emb
    for li in range(num_layers):
        x = layer_fn(params["layers"][li], x, keys[li])
        # ELU between stacked layers only (reference ``model.py:56-73,284-287``).
        if num_layers > 1 and li < num_layers - 1:
            x = jax.nn.elu(x)

    if cfg.project_to_input_size:
        x = apply_projection_head(
            params["projection"],
            x,
            dropout_rate=cfg.projection_dropout,
            train=train,
            rng=keys[-1],
            compute_dtype=compute_dtype,
        )
    return x


def forward(
    params: Params,
    cfg: ModelConfig,
    node_emb: jax.Array,
    graph: GraphData,
    src_ids: jax.Array,
    rel_ids: jax.Array,
    dst_ids: jax.Array,
    *,
    transform_to_input_if_possible: bool = True,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Scores (+ optional relation-transformed sources, dst vectors) for a
    batch of triplets (reference ``model.py:99-142``)."""
    x = single_gat_step(params, cfg, node_emb, graph, train=train, rng=rng)
    src_vec = jnp.take(x, src_ids, axis=0)
    dst_vec = jnp.take(x, dst_ids, axis=0)
    transformed = None
    if cfg.project_to_input_size and transform_to_input_if_possible:
        transformed = scorer_mod.transform(
            params["scorer"], cfg.scorer_type, src_vec, rel_ids
        )
    scores = scorer_mod.score_triplets(
        params["scorer"], cfg.scorer_type, src_vec, rel_ids, dst_vec
    )
    return scores, transformed, dst_vec


def get_node_repr(
    params: Params, cfg: ModelConfig, node_emb: jax.Array, graph: GraphData
) -> jax.Array:
    """Full node-representation matrix for export/indexing
    (reference ``model.py:144-150``); real rows only."""
    x = single_gat_step(params, cfg, node_emb, graph, train=False)
    return x[: graph.num_real_nodes]


def transform_from_vectors(
    params: Params,
    cfg: ModelConfig,
    src_vectors: jax.Array,  # [B, D_sc]
    rel_ids: jax.Array,      # [B], [1] or scalar — broadcast over the batch
) -> jax.Array:
    """Relation operator on arbitrary vectors in scorer space — the
    relation-path composition / query-expansion primitive
    (reference ``model.py:169-186``)."""
    rel_ids = jnp.atleast_1d(rel_ids)
    if rel_ids.shape[0] == 1 and src_vectors.shape[0] > 1:
        rel_ids = jnp.broadcast_to(rel_ids, (src_vectors.shape[0],))
    return scorer_mod.transform(
        params["scorer"], cfg.scorer_type, src_vectors, rel_ids
    )


def transform(
    params: Params,
    cfg: ModelConfig,
    node_emb: jax.Array,
    graph: GraphData,
    src_ids: jax.Array,
    rel_ids: jax.Array,
) -> jax.Array:
    """Gather node representations then apply the relation operator
    (reference ``model.py:152-167``)."""
    x = single_gat_step(params, cfg, node_emb, graph, train=False)
    return transform_from_vectors(params, cfg, jnp.take(x, src_ids, axis=0), rel_ids)


# ---------------------------------------------------------------------------
# Persistence (HF-style directory: config.json + weights)
# ---------------------------------------------------------------------------

_WEIGHTS_NAME = "relgat-model.msgpack"


def save_pretrained(
    output_dir: str,
    params: Params,
    cfg: ModelConfig,
    add_files: Optional[list] = None,
) -> None:
    """Write ``config.json`` + weights (reference ``model.py:196-215``,
    fixed: the reference version crashes on its unset ``self._config``)."""
    from flax import serialization

    os.makedirs(output_dir, exist_ok=True)
    files = list(add_files or [])
    files.append((Defaults.MODEL_CONFIG_FILE_NAME, cfg.to_dict()))
    for fname, content in files:
        with open(os.path.join(output_dir, fname), "w", encoding="utf-8") as f:
            json.dump(content, f, ensure_ascii=False, indent=2)
    host_params = jax.device_get(params)
    with open(os.path.join(output_dir, _WEIGHTS_NAME), "wb") as f:
        f.write(serialization.to_bytes(host_params))


def load_from_pretrained(
    input_dir: str,
    *,
    node_emb: np.ndarray,
) -> Tuple[Params, ModelConfig]:
    """Read config + weights, validating the input dim against the provided
    embeddings (reference ``model.py:217-272``)."""
    from flax import serialization

    cfg_path = os.path.join(input_dir, Defaults.MODEL_CONFIG_FILE_NAME)
    w_path = os.path.join(input_dir, _WEIGHTS_NAME)
    if not os.path.isfile(cfg_path):
        raise FileNotFoundError(f"Config file not found: {cfg_path}")
    if not os.path.isfile(w_path):
        raise FileNotFoundError(f"Weights file not found: {w_path}")

    with open(cfg_path, "r", encoding="utf-8") as f:
        cfg = ModelConfig.from_dict(json.load(f))

    if int(cfg.in_dim) != int(node_emb.shape[1]):
        raise ValueError(
            f"Input dim mismatch: config={cfg.in_dim} vs "
            f"node_emb={node_emb.shape[1]}"
        )

    template = init_model(jax.random.PRNGKey(0), cfg)
    with open(w_path, "rb") as f:
        params = serialization.from_bytes(template, f.read())
    return params, cfg
