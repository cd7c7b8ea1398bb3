"""Statistical parity: n>=5 seeds per implementation on the PARITY
round-3b protocol, at BOTH scales (500-node self-loop KG and the 10k-node
BASELINE #1 exact-NN KG).

Round 3 established learnable-task parity on n=2 seeds; a systematic
difference in either direction hides comfortably in n=2 (VERDICT r3 weak
2). This harness runs the identical protocol over >=5 seeds per scale,
records every curve incrementally to ``reval_r4/parity_stats.json`` (so a
preempted run keeps its partial evidence), and prints a mean+-std summary
with per-seed paired differences.

Usage:  PYTHONPATH=. python scripts/parity_stats.py [--scale both]
        [--seeds 7 11 23 31 43] [--out reval_r4/parity_stats.json]

Both implementations run on CPU (same platform; the torch side re-derives
the reference's exact semantics — see scripts/parity_train.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


SCALES = {
    # Round-3 500-node protocol (PARITY.md "Round 3"): self-loop KG.
    "small": dict(
        nodes=500, edges=5000, rels=6, dim=48, out_dim=16, heads=2,
        layers=2, epochs=20, batch=128, num_neg=6, lr=5e-3,
        self_loops=True, exact_nn=False,
    ),
    # Round-3b BASELINE #1 protocol (PARITY.md "Round 3b"): exact-NN KG.
    "baseline1": dict(
        nodes=10_000, edges=100_000, rels=8, dim=200, out_dim=50, heads=4,
        layers=2, epochs=8, batch=256, num_neg=16, lr=5e-3,
        self_loops=True, exact_nn=True,
    ),
}


def _load(path: Path) -> dict:
    if path.is_file():
        return json.loads(path.read_text())
    return {}


def _save(path: Path, results: dict) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(results, indent=1))
    tmp.replace(path)


def run_one(scale_key: str, seed: int, results: dict, out: Path,
            matched_init: bool = False) -> None:
    import parity_train as PT

    cfg = SCALES[scale_key]
    args = types.SimpleNamespace(**cfg)
    key = f"{scale_key}/s{seed}"
    entry = results.setdefault(key, {})

    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg

    data = generate_synthetic_kg(
        num_nodes=cfg["nodes"], num_edges=cfg["edges"],
        num_rel=cfg["rels"], emb_dim=cfg["dim"], seed=seed,
        self_loops=cfg["self_loops"],
        nn_pool=cfg["nodes"] if cfg["exact_nn"] else 0,
    )

    # Matched-init protocol (VERDICT r4 #5): ours runs FIRST and captures
    # its initial weights; the torch oracle then starts from exactly those
    # weights, so per-seed differences cannot come from init RNGs.
    captured: dict = {}
    order = (
        (("ours", PT.run_ours), ("torch", PT.run_torch_reference))
        if matched_init
        else (("torch", PT.run_torch_reference), ("ours", PT.run_ours))
    )
    for impl, fn in order:
        if impl in entry:
            print(f"[skip] {key} {impl} (cached)")
            if matched_init and impl == "ours":
                # torch still needs the init: re-capture deterministically.
                PT.run_ours(data, types.SimpleNamespace(**{**cfg, "epochs": 0}),
                            seed, init_out=captured)
            continue
        t0 = time.time()
        if matched_init and impl == "ours":
            curve = fn(data, args, seed, init_out=captured)
        elif matched_init and impl == "torch":
            assert "params" in captured, "ours must run before torch"
            curve = fn(data, args, seed, init_params=captured["params"])
        else:
            curve = fn(data, args, seed)
        dt = time.time() - t0
        entry[impl] = {
            "mrr_curve": [float(c[0]) for c in curve],
            "final_mrr": float(curve[-1][0]),
            # Mean of the last 3 epochs — steadier than one epoch's eval
            # (the sampled-negative eval has per-epoch noise of its own).
            "tail_mrr": float(np.mean([c[0] for c in curve[-3:]])),
            "wall_s": round(dt, 1),
        }
        _save(out, results)
        print(f"[done] {key} {impl}: final={entry[impl]['final_mrr']:.4f} "
              f"tail={entry[impl]['tail_mrr']:.4f} ({dt:.0f}s)", flush=True)


def summarize(results: dict) -> str:
    lines = []
    for scale_key, cfg in SCALES.items():
        rows = {
            int(k.split("/s")[1]): v
            for k, v in results.items()
            if k.startswith(scale_key + "/") and "torch" in v and "ours" in v
        }
        if not rows:
            continue
        seeds = sorted(rows)
        t = np.array([rows[s]["torch"]["tail_mrr"] for s in seeds])
        o = np.array([rows[s]["ours"]["tail_mrr"] for s in seeds])
        d = o - t
        k = cfg["num_neg"]
        rnd = sum(1.0 / r for r in range(1, k + 2)) / (k + 1)
        lines.append(f"== {scale_key} (random MRR {rnd:.3f}, n={len(seeds)})")
        for s in seeds:
            lines.append(
                f"  seed {s}: torch {rows[s]['torch']['tail_mrr']:.4f} "
                f"ours {rows[s]['ours']['tail_mrr']:.4f}"
            )
        se = d.std(ddof=1) / np.sqrt(len(d)) if len(d) > 1 else float("nan")
        lines.append(
            f"  torch {t.mean():.4f}+-{t.std(ddof=1):.4f}  "
            f"ours {o.mean():.4f}+-{o.std(ddof=1):.4f}  "
            f"paired diff (ours-torch) {d.mean():+.4f}+-{d.std(ddof=1):.4f} "
            f"(SE {se:.4f}; |mean|<2SE -> overlap)"
        )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["small", "baseline1", "both"],
                    default="both")
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[7, 11, 23, 31, 43])
    ap.add_argument("--out", default="reval_r4/parity_stats.json")
    ap.add_argument("--summary-only", action="store_true")
    ap.add_argument("--matched-init", action="store_true",
                    help="run ours first, then start the torch oracle from "
                         "OUR captured initial weights (give a different "
                         "--out; VERDICT r4 #5)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    out = Path(args.out)
    results = _load(out)
    if not args.summary_only:
        scales = (
            ["small", "baseline1"] if args.scale == "both" else [args.scale]
        )
        for scale_key in scales:
            for seed in args.seeds:
                run_one(scale_key, seed, results, out,
                        matched_init=args.matched_init)
    print(summarize(results))


if __name__ == "__main__":
    main()
