"""Inference and export: the reference README's headline capabilities.

Built on the relation operator ``transform`` (reference ``scorer.py:86-94,
188-201``) and the inference helpers of ``model.py:144-186``:

- full node-representation export for offline indexing
  (``get_node_repr``, ``model.py:144-150``),
- relation-path composition: apply relation operators in sequence in the
  scorer's embedding space (repeated ``transform_from_vectors``),
- query expansion: transform a query vector by a relation and rank all node
  representations by cosine similarity,
- inductive embedding imputation for vector-less nodes: aggregate the
  relation-transformed representations of known neighbors
  (README.md:2-6 — "inductive imputation for nodes without vectors").
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from relgat_projector_tpu.config import ModelConfig
from relgat_projector_tpu.data.graph import GraphData
from relgat_projector_tpu.models import model as model_lib
from relgat_projector_tpu.models.scorer import l2_normalize
from relgat_projector_tpu.models import scorer as scorer_mod


def export_node_representations(
    params,
    cfg: ModelConfig,
    node_emb: jax.Array,
    graph: GraphData,
    path: str | None = None,
) -> np.ndarray:
    """Full ``[N, D_sc]`` representation matrix (real nodes only); written
    to ``path`` as ``.npy`` when given."""
    x = np.asarray(model_lib.get_node_repr(params, cfg, node_emb, graph))
    if path is not None:
        np.save(path, x)
    return x


def compose_relation_path(
    params,
    cfg: ModelConfig,
    vectors: jax.Array,          # [B, D_sc] starting vectors
    rel_path: Sequence[int],     # relation ids applied in order
) -> jax.Array:
    """Apply ``f_{r_k} ∘ ... ∘ f_{r_1}`` — relation-path composition by
    repeated ``transform_from_vectors`` (reference ``model.py:169-186``)."""
    out = vectors
    for rel_id in rel_path:
        out = model_lib.transform_from_vectors(
            params, cfg, out, jnp.asarray([rel_id])
        )
    return out


def query_expansion(
    params,
    cfg: ModelConfig,
    node_repr: jax.Array,   # [N, D_sc] (e.g. from export_node_representations)
    query_vec: jax.Array,   # [D_sc] or [B, D_sc]
    rel_id: int,
    top_k: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    """Transform the query by the relation operator and rank nodes by cosine
    similarity. Returns ``(indices [B, top_k], scores [B, top_k])``."""
    q = jnp.atleast_2d(query_vec)
    tq = model_lib.transform_from_vectors(
        params, cfg, q, jnp.asarray([rel_id])
    )
    sims = l2_normalize(tq) @ l2_normalize(node_repr).T   # [B, N]
    scores, idx = jax.lax.top_k(sims, top_k)
    return idx, scores


def impute_embedding(
    params,
    cfg: ModelConfig,
    node_repr: jax.Array,                 # [N, D_sc]
    neighbors: List[Tuple[int, int]],     # (known node id, relation id) pairs
) -> jax.Array:
    """Estimate a representation for a vector-less node from its known
    neighbors: mean of the relation-transformed neighbor representations
    (the inductive-imputation recipe enabled by ``transform_from_vectors``).

    For a missing node ``v`` with edges ``u --r--> v``, each neighbor
    contributes ``f_r(repr(u))`` — the model's prediction of where ``v``
    should live in embedding space.
    """
    if not neighbors:
        raise ValueError("impute_embedding needs at least one neighbor")
    ids = jnp.asarray([u for u, _ in neighbors])
    rels = jnp.asarray([r for _, r in neighbors])
    vecs = jnp.take(node_repr, ids, axis=0)
    transformed = scorer_mod.transform(
        params["scorer"], cfg.scorer_type, vecs, rels
    )
    return jnp.mean(transformed, axis=0)


def score_candidates(
    params,
    cfg: ModelConfig,
    node_repr: jax.Array,
    src_id: int,
    rel_id: int,
    candidate_ids: jax.Array,
) -> jax.Array:
    """Scorer-based link-prediction scores of candidate destinations."""
    src = jnp.broadcast_to(
        node_repr[src_id], (candidate_ids.shape[0], node_repr.shape[1])
    )
    rels = jnp.full((candidate_ids.shape[0],), rel_id, jnp.int32)
    dst = jnp.take(node_repr, candidate_ids, axis=0)
    return scorer_mod.score_triplets(
        params["scorer"], cfg.scorer_type, src, rels, dst
    )
