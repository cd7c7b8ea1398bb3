"""Reference-checkpoint interop: import AND export torch ``state_dict``
checkpoints.

The reference ecosystem's trained artifact is a torch ``state_dict`` saved
as ``relgat-model.pt`` next to ``training-config.json`` /
``relations-map.json`` (``/root/reference/relgat_projector/handlers/
storage.py:45-56``, loaded at ``core/model/model.py:252-271``). This module
maps that state_dict onto this framework's pytree so already-trained
reference models can be served/exported/queried here without retraining —
and the inverse (``export_torch_state_dict`` / ``export_torch_checkpoint_
dir``) writes a model trained HERE back into the reference's on-disk
format, making the replacement a round trip rather than a one-way door.

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


# ---------------------------------------------------------------------------
# Export: our pytree -> reference torch state_dict
# ---------------------------------------------------------------------------


def export_torch_state_dict(
    params: dict,
    cfg: ModelConfig,
    *,
    node_emb: Optional[np.ndarray] = None,
) -> "Dict[str, object]":
    """Inverse of :func:`import_torch_state_dict`: map our pytree to the
    reference module's exact ``state_dict`` key layout (parameters created
    at ``core/model/layer.py:107-121``, ``core/model/projection.py:48-67``,
    ``core/scorer.py:55,150``; the trainer artifact is this dict saved by
    ``handlers/storage.py:45-56``).

    ``node_emb`` ([N, in_dim]) fills the reference model's
    ``node_emb_fixed`` buffer (``core/model/model.py:32``) so
    ``load_state_dict(strict=True)`` succeeds against a model constructed
    with the same graph. Without it the key is omitted and the torch side
    must load with ``strict=False``.
    """
    import jax
    import torch

    host = jax.device_get(params)

    def t(a: np.ndarray) -> "torch.Tensor":
        return torch.tensor(
            np.ascontiguousarray(np.asarray(a, dtype=np.float32))
        )

    sd: Dict[str, object] = {}
    if node_emb is not None:
        sd["node_emb_fixed"] = t(node_emb)

    layers = host["layers"]
    multi = len(layers) > 1
    for li, layer in enumerate(layers):
        pre = f"gat_layers.{li}." if multi else "gat_layer."
        proj = np.asarray(layer["proj"])  # ours [H, in, out]
        attn = np.asarray(layer["attn"])  # [H, R, out]
        for h in range(proj.shape[0]):
            # torch Linear weight is [out, in]; ours is [in, out].
            sd[f"{pre}proj.{h}.weight"] = t(proj[h].T)
            sd[f"{pre}attn_vec.{h}"] = t(attn[h])
        if "rel_bias" in layer:
            sd[f"{pre}rel_bias"] = t(np.asarray(layer["rel_bias"]))

    proj_head = host.get("projection")
    if proj_head is not None and len(proj_head.get("linears", [])) > 0:
        linears = [np.asarray(w) for w in proj_head["linears"]]
        if len(linears) == 1:
            # num_layers in {0 (dim change), 1}: bare Linear named ``net``.
            sd["projection.net.weight"] = t(linears[0].T)
        else:
            # Sequential blocks Linear(3j) -> GELU(3j+1) -> LayerNorm(3j+2)
            # with a final bare Linear (projection.py:55-67).
            ln_scale = [np.asarray(w) for w in proj_head["ln_scale"]]
            ln_bias = [np.asarray(w) for w in proj_head["ln_bias"]]
            for j, w in enumerate(linears):
                sd[f"projection.net.{3 * j}.weight"] = t(w.T)
                if j < len(linears) - 1:
                    sd[f"projection.net.{3 * j + 2}.weight"] = t(ln_scale[j])
                    sd[f"projection.net.{3 * j + 2}.bias"] = t(ln_bias[j])

    sd["scorer.rel_emb.weight"] = t(np.asarray(host["scorer"]["rel_emb"]))
    return sd


def export_torch_checkpoint_dir(
    ckpt_dir: str,
    out_dir: str,
    *,
    node_emb: Optional[np.ndarray] = None,
) -> None:
    """Convert one of THIS framework's checkpoint directories (HF-style
    ``config.json`` + msgpack weights) into a reference-ecosystem checkpoint
    directory:

    - ``relgat-model.pt``      — the trainer artifact name
      (``base/constants.py:28``, written by ``handlers/storage.py:45-56``),
    - ``pytorch_model.bin`` + ``config.json`` — the
      ``RelGATModel.load_from_pretrained`` surface
      (``core/model/model.py:217-271``; config keys read at :234-267),
    - ``training-config.json`` / ``relations-map.json`` sidecars copied
      through when present.
    """
    import torch

    from relgat_projector_tpu.models.model import load_from_pretrained

    if node_emb is None:
        # Config-only load: fabricate a [0, in_dim] placeholder to satisfy
        # the dim check; the exported dict then omits node_emb_fixed.
        with open(
            os.path.join(ckpt_dir, "config.json"), encoding="utf-8"
        ) as f:
            in_dim = int(json.load(f)["in_dim"])
        params, cfg = load_from_pretrained(
            ckpt_dir, node_emb=np.zeros((0, in_dim), np.float32)
        )
    else:
        params, cfg = load_from_pretrained(ckpt_dir, node_emb=node_emb)

    sd = export_torch_state_dict(params, cfg, node_emb=node_emb)
    os.makedirs(out_dir, exist_ok=True)
    torch.save(sd, os.path.join(out_dir, "relgat-model.pt"))
    torch.save(sd, os.path.join(out_dir, "pytorch_model.bin"))

    # config.json with exactly the keys RelGATModel.load_from_pretrained
    # reads (core/model/model.py:246-267). The reference's own
    # save_pretrained crashes on its unset ``_config`` (model.py:194), so
    # this exporter is what actually produces that surface.
    ref_cfg = {
        "input_dim": int(cfg.in_dim),
        "num_rel": int(cfg.num_rel),
        "scorer_type": cfg.scorer_type,
        "gat_out_dim": int(cfg.gat_out_dim),
        "gat_heads": int(cfg.gat_heads),
        "dropout": float(cfg.dropout),
        "relation_attn_dropout": float(cfg.rel_attn_dropout),
        "gat_num_layers": int(cfg.gat_num_layers),
        "project_to_input_size": bool(cfg.project_to_input_size),
        "projection_layers": int(cfg.projection_layers),
        "projection_dropout": float(cfg.projection_dropout),
        "projection_hidden_dim": int(cfg.projection_hidden_dim),
    }
    with open(
        os.path.join(out_dir, "config.json"), "w", encoding="utf-8"
    ) as f:
        json.dump(ref_cfg, f, ensure_ascii=False, indent=2)

    for sidecar in ("training-config.json", "relations-map.json"):
        src = os.path.join(ckpt_dir, sidecar)
        if os.path.isfile(src):
            with open(src, encoding="utf-8") as fi, open(
                os.path.join(out_dir, sidecar), "w", encoding="utf-8"
            ) as fo:
                fo.write(fi.read())


def main_export(argv=None) -> None:
    import argparse
    import pickle

    ap = argparse.ArgumentParser(
        description="Export one of this framework's checkpoints back into "
        "the reference ecosystem's torch format (relgat-model.pt / "
        "pytorch_model.bin + config.json)."
    )
    ap.add_argument("--checkpoint", required=True,
                    help="our checkpoint dir (config.json + msgpack)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--nodes-embeddings-path", default=None,
                    help="optional node2emb pickle; fills the reference's "
                    "node_emb_fixed buffer for strict=True loads")
    args = ap.parse_args(argv)
    node_emb = None
    if args.nodes_embeddings_path:
        with open(args.nodes_embeddings_path, "rb") as f:
            node2emb = pickle.load(f)
        n = max(int(k) for k in node2emb) + 1
        dim = len(next(iter(node2emb.values())))
        node_emb = np.zeros((n, dim), np.float32)
        for k, v in node2emb.items():
            node_emb[int(k)] = np.asarray(v, np.float32)
    export_torch_checkpoint_dir(args.checkpoint, args.out, node_emb=node_emb)
    print(f"Exported {args.checkpoint} -> {args.out} (torch format)")


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
