from relgat_projector_tpu.parallel.mesh import make_mesh  # noqa: F401
from relgat_projector_tpu.parallel.sharded import (  # noqa: F401
    place_batch,
    place_graph,
    place_replicated,
    shard_batch_arrays,
)
from relgat_projector_tpu.parallel.halo import (  # noqa: F401
    PartitionedGraph,
    partition_graph_by_dst,
    edge_partitioned_propagate,
)
from relgat_projector_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    is_primary,
)
