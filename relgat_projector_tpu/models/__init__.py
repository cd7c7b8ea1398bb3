from relgat_projector_tpu.models.layer import (  # noqa: F401
    init_relgat_layer,
    apply_relgat_layer,
)
from relgat_projector_tpu.models.projection import (  # noqa: F401
    init_projection_head,
    apply_projection_head,
)
from relgat_projector_tpu.models.scorer import (  # noqa: F401
    init_scorer,
    score_triplets,
    transform,
    l2_normalize,
)
from relgat_projector_tpu.models import model  # noqa: F401
