from relgat_projector_tpu.ops.pallas.kernels import (  # noqa: F401
    relgat_propagate_pallas,
    sddmm_scores,
    blocked_aggregate,
)
