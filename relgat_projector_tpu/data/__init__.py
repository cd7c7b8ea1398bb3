from relgat_projector_tpu.data.graph import (  # noqa: F401
    GraphData,
    build_graph,
    pad_node_embeddings,
    split_edges,
    compact_node_ids,
)
from relgat_projector_tpu.data.dataset import RelGATData, Batch  # noqa: F401
from relgat_projector_tpu.data.io import load_embeddings_and_edges  # noqa: F401
from relgat_projector_tpu.data.synthetic import generate_synthetic_kg  # noqa: F401
