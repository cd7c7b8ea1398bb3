"""Typed configuration for the TPU RelGAT framework.

Replaces the reference's three-way config system (argparse flags ->
``run_config`` dict -> constants defaults, see reference
``relgat_projector/base/constants.py:2-31`` and the run_config-wins pattern at
e.g. ``trainer/relgat_projector.py:164-236``) with typed dataclasses and a
single precedence rule: explicit overrides > config file > defaults.

The full resolved config is serialized into every checkpoint as
``training-config.json`` (parity with reference ``trainer:895-899``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


class Defaults:
    """Library defaults (parity: reference ``base/constants.py:2-31``)."""

    EPOCHS = 12
    TRAIN_EVAL_RATIO = 0.9
    TRAIN_BATCH_SIZE = 256
    LOG_EVERY_N_STEPS = 100

    NUM_NEG = 6
    GAT_HEADS = 12
    GAT_NUM_LAYERS = 1
    GAT_DROPOUT = 0.25
    PROJECTION_DROPOUT = 0.25
    GAT_ATT_DROPOUT = 0.0
    GAT_OUT_DIM = 300

    LR = 2e-4
    LR_SCHEDULER = "linear"  # {"linear", "cosine", "constant"}
    WARMUP_STEPS = None
    DEFAULT_WARMUP_RATIO = 0.1

    GAT_SCORER = "distmult"  # {"distmult", "transe"}

    OUT_MODEL_NAME = "relgat-model.msgpack"
    DEFAULT_TRAINER_OUT_DIR = "relgat-out"
    TRAINING_CONFIG_FILE_NAME = "training-config.json"
    TRAINING_CONFIG_REL_TO_IDX = "relations-map.json"
    TRAIN_STATE_DIR_NAME = "train-state"
    MODEL_CONFIG_FILE_NAME = "config.json"


# Architecture presets. The reference left these unwired TODO stubs
# (``core/architecture/_todo_available.py:5-11``); here they are functional.
ARCHITECTURE_PRESETS: Dict[str, Dict[str, int]] = {
    "small": {"gat_out_dim": 128, "gat_num_layers": 2, "gat_heads": 8},
    "medium": {"gat_out_dim": 128, "gat_num_layers": 3, "gat_heads": 10},
    "large": {"gat_out_dim": 256, "gat_num_layers": 4, "gat_heads": 12},
}


@dataclass(frozen=True)
class ModelConfig:
    """Static architecture spec (hashable -> usable under ``jax.jit``).

    Mirrors the constructor surface of the reference model
    (``core/model/model.py:13-97``).
    """

    in_dim: int
    num_rel: int
    gat_out_dim: int = Defaults.GAT_OUT_DIM
    gat_heads: int = Defaults.GAT_HEADS
    gat_num_layers: int = Defaults.GAT_NUM_LAYERS
    dropout: float = Defaults.GAT_DROPOUT
    rel_attn_dropout: float = Defaults.GAT_ATT_DROPOUT
    use_rel_bias: bool = True
    scorer_type: str = Defaults.GAT_SCORER
    project_to_input_size: bool = True
    projection_layers: int = 1
    projection_dropout: float = 0.0
    projection_hidden_dim: int = 0
    # TPU-specific knobs (no reference counterpart):
    param_dtype: str = "float32"   # parameter storage dtype
    compute_dtype: str = "float32" # activation dtype for matmuls
    use_pallas: bool = False       # fused Pallas segment kernels for the hot path
    remat: bool = False            # jax.checkpoint each GAT layer (trade
    # recompute for the all-N activation memory of full-graph backward)
    block_nodes: int = 0           # blocked-layout TD (0 = auto-tune from
    # the graph's degree distribution, data/layout_tuner.py)
    chunk_edges: int = 0           # blocked-layout TE (0 = auto-tune)
    kernel_precision: str = "highest"  # Pallas MXU passes: "highest"
    # (fp32-exact, reference parity) | "default" (1-pass bf16). Mosaic has
    # no intermediate tier; a legacy "high" value is accepted as an alias
    # of "highest" for old serialized configs.
    scan_segments: int = 0         # >1: lax.scan the fused kernels over
    # that many edge segments per device — bounds per-edge gather memory
    # for huge graphs (the single-shot backward needs ~3*E*H*F*4 bytes).
    # Composes with the halo mesh (per-shard segment stacks scanned inside
    # shard_map; disables halo_overlap); single-device and multi-chip both.
    mesh_propagate: str = "halo"   # graph-axis strategy when graph_axis > 1:
    # "halo" (node-sharded features + boundary-only all_to_all,
    # parallel/halo.py) | "replicated" (replicated features, per-device
    # blocked shards, parallel/pallas_sharded.py) | "gspmd" (XLA-inserted
    # psums of full [N,...] partials over sharded edge lists)
    halo_overlap: bool = True      # "halo" mode: split local-/remote-source
    # edges so the boundary all_to_all overlaps with local aggregation
    # (flash-style softmax-state merge; parallel/halo.py)
    partition_nodes: bool = False  # "halo" mode: min-cut node relabeling
    # (BFS-grow + label propagation, data/partition.py) before the halo
    # build, so shuffled-id clustered KGs get clustered-case comm instead
    # of worst-case. Off by default: it permutes the id-keyed sampling
    # streams, so runs are not step-for-step identical to unpartitioned
    # single-device runs (statistically equivalent).

    def __post_init__(self) -> None:
        if self.scorer_type.lower() not in ("distmult", "transe"):
            raise ValueError(f"Unknown scorer_type: {self.scorer_type}")
        if self.mesh_propagate not in ("halo", "replicated", "gspmd"):
            raise ValueError(
                f"Unknown mesh_propagate: {self.mesh_propagate}"
            )
        if self.project_to_input_size and self.projection_layers < 1:
            raise ValueError(
                "projection_layers must be >= 1 when project_to_input_size=True"
            )
        if self.gat_num_layers < 1:
            raise ValueError("gat_num_layers must be >= 1")

    @property
    def gat_concat_dim(self) -> int:
        return self.gat_out_dim * self.gat_heads

    @property
    def scorer_dim(self) -> int:
        """Dimension the scorer operates in (reference ``model.py:76-85``)."""
        return self.in_dim if self.project_to_input_size else self.gat_concat_dim

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(ModelConfig)}
        return ModelConfig(**{k: v for k, v in d.items() if k in known})


@dataclass(frozen=True)
class TrainConfig:
    """Optimization / loop spec (reference ``trainer/relgat_projector.py:32-92``)."""

    epochs: int = Defaults.EPOCHS
    train_batch_size: int = Defaults.TRAIN_BATCH_SIZE
    eval_batch_size: int = Defaults.TRAIN_BATCH_SIZE
    num_neg: int = Defaults.NUM_NEG
    train_ratio: float = Defaults.TRAIN_EVAL_RATIO
    seed: int = 42

    lr: float = Defaults.LR
    lr_scheduler: str = Defaults.LR_SCHEDULER
    lr_decay: float = 1.0
    warmup_steps: Optional[int] = None
    weight_decay: float = 0.0
    grad_clip_norm: Optional[float] = None
    optimizer: str = "adam"  # "adam" (torch-Adam semantics) | "adamw"

    margin: float = 1.0
    use_self_adv_neg: bool = False
    self_adv_alpha: float = 1.0
    relgat_weight: float = 1.0
    pos_cosine_weight: float = 1.0
    neg_cosine_weight: float = 1.0
    mse_weight: float = 0.0

    eval_every_n_steps: Optional[int] = None
    save_every_n_steps: Optional[int] = None
    early_stop_patience: Optional[int] = None
    eval_ks_ranks: Tuple[int, ...] = (1, 2, 3)
    log_every_n_steps: int = Defaults.LOG_EVERY_N_STEPS

    max_checkpoints: int = 5
    out_dir: str = Defaults.DEFAULT_TRAINER_OUT_DIR
    # TPU knob (no reference counterpart): train steps per jitted dispatch
    # (lax.scan over stacked batches). >1 amortizes per-call host/runtime
    # overhead; metrics/eval cadence coarsens to call granularity.
    steps_per_call: int = 1

    def __post_init__(self) -> None:
        if self.lr_scheduler.lower() not in ("linear", "cosine", "constant"):
            raise ValueError(f"Unknown lr_scheduler type: {self.lr_scheduler}")
        # Parity with the reference CLI invariants (apps ``:355-370``).
        if (
            self.save_every_n_steps is not None
            and self.eval_every_n_steps is not None
        ):
            if self.save_every_n_steps < self.eval_every_n_steps:
                raise ValueError(
                    "save_every_n_steps must be >= eval_every_n_steps"
                )
            if self.save_every_n_steps % self.eval_every_n_steps != 0:
                raise ValueError(
                    "save_every_n_steps must be divisible by eval_every_n_steps"
                )

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["eval_ks_ranks"] = list(self.eval_ks_ranks)
        return d

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "TrainConfig":
        known = {f.name for f in dataclasses.fields(TrainConfig)}
        d = {k: v for k, v in d.items() if k in known}
        if "eval_ks_ranks" in d and d["eval_ks_ranks"] is not None:
            d["eval_ks_ranks"] = tuple(sorted(set(d["eval_ks_ranks"])))
        return TrainConfig(**d)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for multi-chip training (no reference counterpart;
    the reference is single-device, SURVEY.md §2.3)."""

    data_axis: int = 1   # DP over the triplet batch
    graph_axis: int = 1  # edge partitioning of the message-passing graph
    model_axis: int = 1  # TP over attention heads (banks shard on heads)

    @property
    def num_devices(self) -> int:
        return self.data_axis * self.graph_axis * self.model_axis


@dataclass
class RunConfig:
    """Bundles everything for one training run; fully JSON-serializable."""

    model: ModelConfig
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    architecture_name: Optional[str] = None
    base_model_name: Optional[str] = "relgat"
    run_name: Optional[str] = None

    def to_dict(self) -> Dict[str, Any]:
        return {
            "model": self.model.to_dict(),
            "train": self.train.to_dict(),
            "mesh": dataclasses.asdict(self.mesh),
            "architecture_name": self.architecture_name,
            "base_model_name": self.base_model_name,
            "run_name": self.run_name,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, ensure_ascii=False)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "RunConfig":
        return RunConfig(
            model=ModelConfig.from_dict(d["model"]),
            train=TrainConfig.from_dict(d.get("train", {})),
            mesh=MeshConfig(**d.get("mesh", {})),
            architecture_name=d.get("architecture_name"),
            base_model_name=d.get("base_model_name", "relgat"),
            run_name=d.get("run_name"),
        )

    @staticmethod
    def from_json(s: str) -> "RunConfig":
        return RunConfig.from_dict(json.loads(s))


def apply_architecture_preset(
    name: Optional[str], overrides: Dict[str, Any]
) -> Dict[str, Any]:
    """Merge a named preset under explicit overrides (overrides win).

    The reference parsed ``--architecture-name`` but never applied it
    (``core/architecture/constructor.py:48-50`` is a TODO stub); here presets
    are functional. Unknown names pass through (the reference accepted any
    string).
    """
    merged = dict(overrides)
    preset = ARCHITECTURE_PRESETS.get((name or "").lower())
    if preset:
        for k, v in preset.items():
            merged.setdefault(k, v)
    return merged
