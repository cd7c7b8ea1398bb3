"""Checkpoint storage with full train-state resume.

Parity + fixes vs reference ``handlers/storage.py:13-72``:
- each checkpoint dir gets the model weights + ``training-config.json`` +
  ``relations-map.json`` sidecars (same sidecar names,
  ``base/constants.py:28-31``),
- FIFO pruning actually works (the reference's deque was never appended to —
  SURVEY.md §3 quirk 4),
- NEW: the full train state (params, Adam moments, step counter, RNG key,
  non-finite counter) is saved alongside, enabling true preemption resume —
  the reference saved weights only and could not resume (SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from collections import deque
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax

from relgat_projector_tpu.config import Defaults, ModelConfig
from relgat_projector_tpu.models import model as model_lib
from relgat_projector_tpu.train.state import TrainState

_STATE_FILE = "train-state.msgpack"


def _state_to_pytree(state: TrainState) -> Dict[str, Any]:
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
        "nonfinite_steps": state.nonfinite_steps,
    }


def save_train_state(
    path: str, state: TrainState, *, async_write: bool = False
) -> Optional[threading.Thread]:
    """Persist the full train state. With ``async_write`` the device->host
    copy happens synchronously (cheap) but serialization + disk IO run on a
    background thread so training resumes immediately (the reference blocked
    the loop on every ``torch.save``)."""
    from flax import serialization

    host = jax.device_get(_state_to_pytree(state))

    def write():
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(host))
        os.replace(tmp, path)

    if async_write:
        t = threading.Thread(target=write, daemon=True)
        t.start()
        return t
    write()
    return None


def load_train_state(path: str, template: TrainState) -> TrainState:
    from flax import serialization

    with open(path, "rb") as f:
        restored = serialization.from_bytes(_state_to_pytree(template), f.read())
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        rng=restored["rng"],
        nonfinite_steps=restored["nonfinite_steps"],
    )


class RelGATStorage:
    """Checkpoint directory manager (reference ``handlers/storage.py``)."""

    # Trainer-loop sidecar (best metric / early-stop counter / dispatch
    # counter) written next to every train state so resume restores the
    # loop, not just the optimizer.
    LOOP_STATE_FILE = "loop-state.json"

    def __init__(
        self,
        out_dir: Optional[str],
        max_checkpoints: Optional[int] = 5,
        save_every_n_steps: Optional[int] = None,
    ):
        self.max_checkpoints = (
            int(max_checkpoints) if max_checkpoints is not None else None
        )
        self.save_every_n_steps = (
            int(save_every_n_steps)
            if save_every_n_steps is not None and int(save_every_n_steps) > 0
            else None
        )
        self.saved_checkpoints: deque = deque()
        self.best_ckpt_dir: Optional[str] = None
        self.save_dir = Path(
            out_dir if out_dir is not None else Defaults.DEFAULT_TRAINER_OUT_DIR
        )
        self.save_dir.mkdir(parents=True, exist_ok=True)

    def save_checkpoint(
        self,
        subdir: str,
        state: TrainState,
        model_cfg: ModelConfig,
        files: List[Tuple[str, Dict[Any, Any]]],
        *,
        prunable: bool = True,
        async_write: bool = False,
    ) -> str:
        """Write model export + sidecars + full train state into
        ``save_dir/subdir``; returns the checkpoint dir path. With
        ``async_write`` the train-state serialization runs off-thread."""
        # Never let two background writes overlap (or overwrite a pending
        # handle): join the previous one first.
        self.wait_for_writes()
        out_dir = self.save_dir / subdir
        out_dir.mkdir(parents=True, exist_ok=True)
        model_lib.save_pretrained(
            str(out_dir), state.params, model_cfg, add_files=list(files)
        )
        self._pending_write = save_train_state(
            str(out_dir / _STATE_FILE), state, async_write=async_write
        )
        if prunable:
            self.saved_checkpoints.append(out_dir)
        return str(out_dir)

    def wait_for_writes(self) -> None:
        t = getattr(self, "_pending_write", None)
        if t is not None:
            t.join()

    def latest_resumable(self) -> Optional[str]:
        """Newest checkpoint dir containing a train state, or None."""
        candidates = [
            d
            for d in self.save_dir.iterdir()
            if d.is_dir() and (d / _STATE_FILE).is_file()
        ] if self.save_dir.exists() else []
        if not candidates:
            return None
        return str(max(candidates, key=lambda d: d.stat().st_mtime))

    def load_checkpoint(self, ckpt_dir: str, template: TrainState) -> TrainState:
        return load_train_state(os.path.join(ckpt_dir, _STATE_FILE), template)

    def load_loop_state(self, ckpt_dir: str) -> Optional[Dict[str, Any]]:
        """Read the trainer-loop sidecar, or None for pre-sidecar dirs."""
        path = os.path.join(ckpt_dir, self.LOOP_STATE_FILE)
        if not os.path.isfile(path):
            return None
        with open(path, "r", encoding="utf-8") as f:
            return json.load(f)

    def prune_checkpoints(self) -> None:
        """Keep the ``max_checkpoints`` most recent prunable checkpoints."""
        if self.max_checkpoints is None or self.max_checkpoints < 1:
            return
        # Don't rmtree a directory whose background write is in flight.
        self.wait_for_writes()
        while len(self.saved_checkpoints) > self.max_checkpoints:
            oldest = self.saved_checkpoints.popleft()
            try:
                shutil.rmtree(oldest)
                print(f"Removed old checkpoint: {oldest}")
            except Exception as exc:
                print(f"Could not delete {oldest}: {exc}")
