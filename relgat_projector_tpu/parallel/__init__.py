from relgat_projector_tpu.parallel.mesh import make_mesh  # noqa: F401
from relgat_projector_tpu.parallel.sharded import (  # noqa: F401
    place_batch,
    place_graph,
    place_replicated,
    shard_batch_arrays,
)
