from relgat_projector_tpu.utils.seeding import RandomSeed  # noqa: F401
from relgat_projector_tpu.utils.logging_adapter import LoggerAdapter  # noqa: F401
