from relgat_projector_tpu.parallel.mesh import make_mesh  # noqa: F401
from relgat_projector_tpu.parallel.sharded import (  # noqa: F401
    place_batch,
    place_graph,
    place_node_features,
    place_replicated,
    place_scan_batch,
    shard_batch_arrays,
)
from relgat_projector_tpu.parallel.halo import (  # noqa: F401
    HaloGraph,
    build_halo_graph,
    halo_propagate,
    place_halo_graph,
)
from relgat_projector_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    is_primary,
)
from relgat_projector_tpu.parallel.pallas_sharded import (  # noqa: F401
    ShardedBlockedGraph,
    pallas_sharded_propagate,
    place_sharded_blocked,
    shard_blocked_graph,
)
