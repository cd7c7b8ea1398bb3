"""Decompose OUR per-seed tail-MRR variance at the baseline1 parity scale
(VERDICT r4 weak #4 follow-up).

Matched-init parity showed the small-scale variance gap is init-driven,
but at baseline1 the torch oracle started from OUR EXACT initial weights
(seed 7) and still landed ~0.30 while ours landed ~0.41 — same init, same
split, 0.11 apart. So the s7 outlier is NOT the init draw. This harness
holds the KG + split + batch order fixed (tc.seed) and varies ONE factor
at a time:

  - stream-*: same init, different `train_key` (device-side negative
    sampling stream);
  - init-*: different init draw, same train_key.

If stream variants reproduce the 0.28-0.41 swing, the cross-seed variance
is negative-stream luck amplified by this task's eval (few-negative
sampled MRR); if init variants do, it's init after all (contradicting the
matched-init torch run); if neither, it's the KG realization interacting
with dynamics.

Usage: PYTHONPATH=. python scripts/variance_decomp.py
       [--out reval_r5/variance_decomp.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

CFG = dict(
    nodes=10_000, edges=100_000, rels=8, dim=200, out_dim=50, heads=4,
    layers=2, epochs=8, batch=256, num_neg=16, lr=5e-3,
    self_loops=True, exact_nn=True,
)
SEED = 7  # the outlier seed: ours 0.4083 vs torch 0.2962/0.2977


def run_variant(data, tag, init_key_seed=None, train_key_seed=None):
    import jax

    from relgat_projector_tpu.config import ModelConfig, RunConfig, TrainConfig
    from relgat_projector_tpu.models.model import init_model
    from relgat_projector_tpu.train.state import create_train_state
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    args = types.SimpleNamespace(**CFG)
    run = RunConfig(
        model=ModelConfig(
            in_dim=args.dim, num_rel=args.rels, gat_out_dim=args.out_dim,
            gat_heads=args.heads, gat_num_layers=args.layers, dropout=0.0,
            project_to_input_size=True, projection_layers=2,
            projection_dropout=0.0,
        ),
        train=TrainConfig(
            epochs=args.epochs, train_batch_size=args.batch,
            eval_batch_size=args.batch, num_neg=args.num_neg,
            lr=args.lr, lr_scheduler="constant", warmup_steps=0,
            use_self_adv_neg=True, weight_decay=1e-4,
            eval_ks_ranks=(1, 3, args.num_neg), seed=SEED,
            log_every_n_steps=10_000, out_dir="/tmp/variance-decomp",
        ),
    )
    node2emb, rel2idx, triplets = data
    tr = RelGATTrainer(run, node2emb, rel2idx, triplets, log_to_console=False)

    # Reconstruct the trainer's own keys (trainer.py: root = PRNGKey(seed);
    # init_key, train_key = split(root)), then override the requested one.
    root = jax.random.PRNGKey(SEED)
    init_key, train_key = jax.random.split(root)
    if init_key_seed is not None:
        init_key = jax.random.PRNGKey(init_key_seed)
    if train_key_seed is not None:
        train_key = jax.random.PRNGKey(train_key_seed)
    params = init_model(init_key, tr.model_cfg)
    tr.state = create_train_state(params, tr.optimizer, train_key)

    curve = []
    for ep in range(args.epochs):
        tr._single_epoch(ep + 1, args.epochs)
        mrr, hits, loss, cosp, _, _ = tr.evaluate()
        curve.append(float(mrr))
    tail = float(np.mean(curve[-3:]))
    return {"tag": tag, "mrr_curve": curve, "tail_mrr": tail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="reval_r5/variance_decomp.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg

    data = generate_synthetic_kg(
        num_nodes=CFG["nodes"], num_edges=CFG["edges"],
        num_rel=CFG["rels"], emb_dim=CFG["dim"], seed=SEED,
        self_loops=CFG["self_loops"], nn_pool=CFG["nodes"],
    )

    out = Path(args.out)
    results = json.loads(out.read_text()) if out.exists() else {}
    variants = [
        ("baseline", None, None),          # == parity protocol: expect ~0.408
        ("stream-a", None, 7701),
        ("stream-b", None, 7702),
        ("init-a", 9001, None),
        ("init-b", 9002, None),
    ]
    for tag, ik, tk in variants:
        if tag in results:
            print(f"[skip] {tag} (cached)")
            continue
        t0 = time.time()
        r = run_variant(data, tag, ik, tk)
        r["wall_s"] = round(time.time() - t0, 1)
        results[tag] = r
        out.write_text(json.dumps(results, indent=1))
        print(f"[done] {tag}: tail={r['tail_mrr']:.4f} "
              f"curve={[round(c, 3) for c in r['mrr_curve']]} "
              f"({r['wall_s']:.0f}s)", flush=True)

    tails = {t: results[t]["tail_mrr"] for t in results}
    print(json.dumps(tails, indent=1))


if __name__ == "__main__":
    main()
