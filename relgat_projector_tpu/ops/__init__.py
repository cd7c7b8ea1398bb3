from relgat_projector_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_max,
    segment_softmax,
    STABLE_SOFTMAX_EPS,
)
from relgat_projector_tpu.ops.relgat_ops import relgat_propagate  # noqa: F401
from relgat_projector_tpu.ops.sampling import (  # noqa: F401
    sample_negative_dst,
)
