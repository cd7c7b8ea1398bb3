from relgat_projector_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
)
from relgat_projector_tpu.train.step import (  # noqa: F401
    make_train_step,
    make_eval_step,
    batch_forward,
)
from relgat_projector_tpu.train.checkpoint import (  # noqa: F401
    RelGATStorage,
    save_train_state,
    load_train_state,
)
from relgat_projector_tpu.train.trainer import RelGATTrainer  # noqa: F401
