"""Utils coverage: logging adapter, profiling helpers, async checkpoints,
config serialization roundtrips."""

import json
import os
import time

import numpy as np
import jax

from relgat_projector_tpu.config import (
    ARCHITECTURE_PRESETS,
    ModelConfig,
    RunConfig,
    TrainConfig,
    apply_architecture_preset,
)
from relgat_projector_tpu.utils.logging_adapter import LoggerAdapter
from relgat_projector_tpu.utils.profiling import StepTimer, trace


def test_logger_adapter_run_names(capsys):
    la = LoggerAdapter(run_name="myrun", log_every_n_steps=5)
    assert la.run_name.startswith("myrun-")
    la2 = LoggerAdapter(architecture_name="small", base_model_name="relgat")
    assert la2.run_name.startswith("relgat-small-")
    la3 = LoggerAdapter()
    assert la3.run_name.startswith("relgat-run-")
    # negative/None cadence clamps to 1 (reference logging_adapter.py:32-37)
    la4 = LoggerAdapter(log_every_n_steps=-3)
    assert la4.log_every_n_steps == 1

    la.log_metrics({"a": 1.5, "b": np.float32(2.0)}, step=3)
    out = capsys.readouterr().out
    assert "Step 3" in out and '"a": 1.5' in out


def test_logger_wandb_degrades_gracefully():
    la = LoggerAdapter(log_to_wandb=True, log_to_console=False)
    la.init_wandb_if_needed()  # no network/key in this env -> degrade
    la.log_metrics({"x": 1}, step=0)
    la.finish_wandb_if_needed()


def test_step_timer_and_trace(tmp_path):
    t = StepTimer(edges_per_step=1000)
    time.sleep(0.01)
    dt, eps = t.lap()
    assert dt > 0 and 0 < eps < 1000 / 0.01 * 2
    with trace(None):
        pass  # no-op path


def test_config_json_roundtrip():
    run = RunConfig(
        model=ModelConfig(in_dim=8, num_rel=3, gat_out_dim=4, gat_heads=2),
        train=TrainConfig(eval_ks_ranks=(1, 2, 5)),
        architecture_name="small",
    )
    restored = RunConfig.from_json(run.to_json())
    assert restored.model == run.model
    assert restored.train == run.train
    assert restored.architecture_name == "small"


def test_architecture_preset_merging():
    merged = apply_architecture_preset("small", {"gat_heads": 4})
    assert merged["gat_heads"] == 4  # explicit wins
    assert merged["gat_out_dim"] == ARCHITECTURE_PRESETS["small"]["gat_out_dim"]
    assert apply_architecture_preset("unknown", {"a": 1}) == {"a": 1}
    assert apply_architecture_preset(None, {}) == {}


def test_async_checkpoint_write(tmp_path):
    from relgat_projector_tpu.schedules import make_lr_schedule
    from relgat_projector_tpu.train.checkpoint import (
        load_train_state,
        save_train_state,
    )
    from relgat_projector_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )

    tc = TrainConfig(lr=1e-3, lr_scheduler="constant", warmup_steps=0)
    opt = make_optimizer(tc, make_lr_schedule(1e-3, "constant", 10, 0))
    params = {"w": jax.numpy.ones((4, 4))}
    state = create_train_state(params, opt, jax.random.PRNGKey(0))

    path = os.path.join(tmp_path, "state.msgpack")
    t = save_train_state(path, state, async_write=True)
    assert t is not None
    t.join()
    restored = load_train_state(path, state)
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.ones((4, 4))
    )
