"""Device-mesh construction.

The reference has no parallelism (single ``.to(device)``, SURVEY.md §2.3).
The TPU framework scales over a named mesh with three axes:

- ``data``  — data parallelism over the triplet batch,
- ``graph`` — edge partitioning of the message-passing graph (the graph
  analog of sequence/context parallelism, SURVEY.md §5.7),
- ``model`` — tensor parallelism over attention HEADS (SURVEY §2.3: heads
  are embarrassingly parallel until the final concat; the per-head
  ``proj``/``attn`` weight banks shard on their leading axis).

Collectives are emitted by GSPMD from sharding placements (psum of partial
segment reductions over the ``graph`` axis, gradient all-reduce over all
axes) and ride ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from relgat_projector_tpu.config import MeshConfig

DATA_AXIS = "data"
GRAPH_AXIS = "graph"
MODEL_AXIS = "model"


def make_mesh(
    mesh_cfg: Optional[MeshConfig] = None,
    *,
    data: Optional[int] = None,
    graph: Optional[int] = None,
    model: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, graph, model)`` mesh. With no sizes given, all
    devices go on the ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if mesh_cfg is not None:
        data = mesh_cfg.data_axis
        graph = mesh_cfg.graph_axis
        model = getattr(mesh_cfg, "model_axis", 1)
    if data is None and graph is None and model is None:
        data, graph, model = len(devices), 1, 1
    data = int(data or 1)
    graph = int(graph or 1)
    model = int(model or 1)
    total = data * graph * model
    if total > len(devices):
        raise ValueError(
            f"Mesh {data}x{graph}x{model} needs {total} devices, "
            f"have {len(devices)}"
        )
    dev_mesh = mesh_utils.create_device_mesh(
        (data, graph, model), devices=np.asarray(devices[:total])
    )
    return Mesh(dev_mesh, (DATA_AXIS, GRAPH_AXIS, MODEL_AXIS))
