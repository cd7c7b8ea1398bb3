from relgat_projector_tpu.ops.pallas.kernels import (  # noqa: F401
    relgat_propagate_pallas,
)
from relgat_projector_tpu.ops.pallas.fused import (  # noqa: F401
    fused_relgat_forward,
    fused_relgat_backward_src,
)
