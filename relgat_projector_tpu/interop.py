"""Reference-checkpoint interop: import a torch ``state_dict`` checkpoint.

The reference ecosystem's trained artifact is a torch ``state_dict`` saved
as ``relgat-model.pt`` next to ``training-config.json`` /
``relations-map.json`` (``/root/reference/relgat_projector/handlers/
storage.py:45-56``, loaded at ``core/model/model.py:252-271``). This module
maps that state_dict onto this framework's pytree so already-trained
reference models can be served/exported/queried here without retraining —
the drop-in-replacement path.

Key map (reference module attribute -> pytree):

====================================  =================================
``gat_layer[s.{li}].proj.{h}.weight``  ``layers[li]["proj"][h].T``
``gat_layer[s.{li}].attn_vec.{h}``     ``layers[li]["attn"][h]``
``gat_layer[s.{li}].rel_bias``         ``layers[li]["rel_bias"]``
``projection.net[.{i}].weight``        ``projection["linears"][j].T``
``projection.net.{i}.weight/bias``     LayerNorm scale/bias (i = 2,5,…)
``scorer.rel_emb.weight``              ``scorer["rel_emb"]``
``node_emb_fixed`` (buffer)            (ignored — embeddings come from data)
====================================  =================================

Architecture hyperparameters are inferred from tensor SHAPES (robust to
incomplete ``training-config.json``); only ``scorer_type`` needs the config
(DistMult and TransE are shape-identical) and defaults to ``distmult``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

from relgat_projector_tpu.config import ModelConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load ``relgat-model.pt`` (file or its checkpoint directory) into
    name -> float32 ndarray."""
    if os.path.isdir(path):
        path = os.path.join(path, "relgat-model.pt")
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {
        k: np.asarray(v.detach().to(torch.float32).numpy())
        for k, v in sd.items()
    }


def _layer_prefixes(sd: Dict[str, np.ndarray]) -> list:
    """Ordered per-layer key prefixes (single- and multi-layer models)."""
    if any(k.startswith("gat_layer.") for k in sd):
        return ["gat_layer."]
    idx = sorted({
        int(m.group(1))
        for k in sd
        if (m := re.match(r"gat_layers\.(\d+)\.", k))
    })
    if not idx:
        raise ValueError("No RelGAT layer weights found in state_dict")
    return [f"gat_layers.{i}." for i in idx]


def import_torch_state_dict(
    sd: Dict[str, np.ndarray],
    *,
    scorer_type: str = "distmult",
    in_dim: Optional[int] = None,
) -> Tuple[dict, ModelConfig]:
    """Map a reference ``state_dict`` to ``(params, ModelConfig)``."""
    prefixes = _layer_prefixes(sd)
    layers = []
    heads = out_dim = num_rel = None
    for li, pre in enumerate(prefixes):
        h_idx = sorted({
            int(m.group(1))
            for k in sd
            if (m := re.match(re.escape(pre) + r"proj\.(\d+)\.weight", k))
        })
        if not h_idx:
            raise ValueError(f"No per-head proj weights under {pre}")
        # torch Linear weight is [out, in]; ours is [in, out].
        proj = np.stack(
            [sd[f"{pre}proj.{h}.weight"].T for h in h_idx]
        )  # [H, in, out]
        attn = np.stack(
            [sd[f"{pre}attn_vec.{h}"] for h in h_idx]
        )  # [H, R, out]
        layer: dict = {"proj": proj, "attn": attn}
        if f"{pre}rel_bias" in sd:
            layer["rel_bias"] = sd[f"{pre}rel_bias"]
        layers.append(layer)
        if li == 0:
            heads = len(h_idx)
            out_dim = proj.shape[2]
            num_rel = attn.shape[1]
            if in_dim is None:
                in_dim = proj.shape[1]

    params: dict = {"layers": layers}

    # --- projection head ------------------------------------------------
    proj_keys = sorted(k for k in sd if k.startswith("projection.net"))
    projection_layers = 0
    projection_hidden = 0
    if proj_keys:
        if "projection.net.weight" in sd:
            params["projection"] = {
                "linears": [sd["projection.net.weight"].T],
                "ln_scale": [],
                "ln_bias": [],
            }
            projection_layers = 1
        else:
            seq_idx = sorted({
                int(m.group(1))
                for k in proj_keys
                if (m := re.match(r"projection\.net\.(\d+)\.weight", k))
            })
            # Sequential: Linear at 0, 3, 6, ...; LayerNorm at 2, 5, ...
            linears = [
                sd[f"projection.net.{i}.weight"].T
                for i in seq_idx
                if f"projection.net.{i}.bias" not in sd
            ]
            ln_scale = [
                sd[f"projection.net.{i}.weight"]
                for i in seq_idx
                if f"projection.net.{i}.bias" in sd
            ]
            ln_bias = [
                sd[f"projection.net.{i}.bias"]
                for i in seq_idx
                if f"projection.net.{i}.bias" in sd
            ]
            params["projection"] = {
                "linears": linears,
                "ln_scale": ln_scale,
                "ln_bias": ln_bias,
            }
            projection_layers = len(linears)
            projection_hidden = int(linears[0].shape[1])

    # --- scorer ---------------------------------------------------------
    if "scorer.rel_emb.weight" not in sd:
        raise ValueError("No scorer weights (scorer.rel_emb.weight) found")
    params["scorer"] = {"rel_emb": sd["scorer.rel_emb.weight"]}

    cfg = ModelConfig(
        in_dim=int(in_dim),
        num_rel=int(num_rel),
        gat_out_dim=int(out_dim),
        gat_heads=int(heads),
        gat_num_layers=len(layers),
        use_rel_bias="rel_bias" in layers[0],
        scorer_type=scorer_type,
        project_to_input_size=projection_layers > 0,
        projection_layers=max(projection_layers, 1)
        if projection_layers > 0
        else 0,
        projection_hidden_dim=projection_hidden,
    )
    # Sanity: scorer dim must match the config's scorer space.
    rel_dim = params["scorer"]["rel_emb"].shape[1]
    if rel_dim != cfg.scorer_dim:
        raise ValueError(
            f"scorer rel_dim {rel_dim} != derived scorer space "
            f"{cfg.scorer_dim} (projection inference wrong?)"
        )

    import jax.numpy as jnp
    import jax

    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params
    )
    return params, cfg


def import_torch_checkpoint_dir(
    ckpt_dir: str,
    out_dir: str,
    weights_file: Optional[str] = None,
) -> Tuple[dict, ModelConfig]:
    """Convert a reference checkpoint directory into this framework's
    HF-style directory (``config.json`` + msgpack weights +
    ``relations-map.json`` if present). ``weights_file`` overrides the
    default ``relgat-model.pt`` inside the directory. Returns
    ``(params, cfg)``."""
    sd = load_torch_state_dict(weights_file or ckpt_dir)

    scorer_type = "distmult"
    tc_path = os.path.join(ckpt_dir, "training-config.json")
    if os.path.isfile(tc_path):
        with open(tc_path, encoding="utf-8") as f:
            tc = json.load(f)
        scorer_type = str(
            tc.get("scorer", tc.get("scorer_type", "distmult"))
        ).lower()

    params, cfg = import_torch_state_dict(sd, scorer_type=scorer_type)

    from relgat_projector_tpu.models.model import save_pretrained

    add_files = []
    rel_path = os.path.join(ckpt_dir, "relations-map.json")
    if os.path.isfile(rel_path):
        with open(rel_path, encoding="utf-8") as f:
            add_files.append(("relations-map.json", json.load(f)))
    save_pretrained(out_dir, params, cfg, add_files=add_files)
    return params, cfg


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Import a reference torch checkpoint "
        "(relgat-model.pt) into this framework's format."
    )
    ap.add_argument("--checkpoint", required=True,
                    help="reference checkpoint dir (or the .pt file)")
    ap.add_argument("--out", required=True, help="output directory")
    args = ap.parse_args(argv)
    ckpt = args.checkpoint
    weights_file = None
    if os.path.isfile(ckpt):
        # Keep the exact file (it may not be named relgat-model.pt); the
        # containing directory still supplies the JSON sidecars.
        weights_file = ckpt
        ckpt = os.path.dirname(ckpt) or "."
    params, cfg = import_torch_checkpoint_dir(
        ckpt, args.out, weights_file=weights_file
    )
    n_params = sum(
        int(np.prod(p.shape))
        for p in __import__("jax").tree_util.tree_leaves(params)
    )
    print(
        f"Imported {cfg.gat_num_layers}-layer/{cfg.gat_heads}-head model "
        f"({n_params} params) -> {args.out}"
    )


if __name__ == "__main__":
    main()
