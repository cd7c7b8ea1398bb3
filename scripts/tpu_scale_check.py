"""Single-chip scale ceiling: train-step at >=8M edges with remat + Pallas.

VERDICT round-1 item 8: extend the linear-in-E throughput claim beyond 2M
edges and establish the one-chip memory ceiling. The per-edge feature
streams are the binding constraint: the kernels materialize [E_bp, H*F]
gathers (fwd ps, bwd ps_src + g_edge), so HBM needs roughly
3 * E * H*F * 4 bytes plus layouts — at H*F = 128 an 8M-edge graph is
~12 GB on a 16 GB v5e.

Usage: PYTHONPATH=. python scripts/tpu_scale_check.py [--edges 8000000]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--nodes", type=int, default=800_000)
    ap.add_argument("--emb-dim", type=int, default=128)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--no-remat", dest="remat", action="store_false")
    ap.add_argument("--scan-segments", dest="scan_segments", type=int,
                    default=0,
                    help=">1: segment-scanned propagate (bounds per-edge "
                         "gather memory; ModelConfig.scan_segments)")
    ap.add_argument("--kernel-precision", default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--skew", type=float, default=0.0,
                    help="power-law dst-degree skew exponent (0 = uniform; "
                         "~1 = WordNet-class heavy tail). Real KGs "
                         "concentrate in-degree on hub nodes, which "
                         "stresses per-block chunk counts in the blocked "
                         "layout")
    ap.add_argument("--clustered", action="store_true",
                    help="community structure: 90%% of edges stay inside "
                         "500-node clusters (the layout sweep's clustered "
                         "class) — exercises src-dst block locality at "
                         "scan scale")
    ap.add_argument("--td", type=int, default=0,
                    help="override block_nodes (0 = per-mode default)")
    ap.add_argument("--te", type=int, default=0,
                    help="override chunk_edges (0 = per-mode default) — "
                         "the scanned-layout sweep knob (VERDICT r4 #8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from relgat_projector_tpu.config import ModelConfig, TrainConfig
    from relgat_projector_tpu.data.graph import build_graph, pad_node_embeddings
    from relgat_projector_tpu.models.model import init_model
    from relgat_projector_tpu.schedules import make_lr_schedule
    from relgat_projector_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from relgat_projector_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)
    n, e = args.nodes, args.edges
    r = 40
    if args.skew > 0:
        # Zipf-ranked destination popularity: p(rank i) ∝ 1/(i+1)^skew,
        # randomly assigned to node ids (so hubs land in arbitrary blocks).
        w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), args.skew)
        p = w / w.sum()
        dst_e = rng.permutation(n)[
            rng.choice(n, size=e, p=p)
        ].astype(np.int32)
        deg = np.bincount(dst_e, minlength=n)
        print(f"skew={args.skew}: max in-degree {deg.max()} "
              f"(uniform would be ~{e // n + 4})")
    else:
        dst_e = rng.integers(0, n, e).astype(np.int32)
    src_e = rng.integers(0, n, e).astype(np.int32)
    if args.clustered:
        cs = 500
        intra = rng.random(e) < 0.9
        dst_e = np.where(
            intra, (src_e // cs) * cs + rng.integers(0, cs, e), dst_e
        ).astype(np.int32)
    t0 = time.perf_counter()
    graph = build_graph(
        src_e,
        dst_e,
        rng.integers(0, r, e).astype(np.int32),
        num_nodes=n,
        blocked=True,
        scan_segments=args.scan_segments,
        # Per-mode layout optimum (BENCH_NOTES round-3 sweep), matching
        # the trainer's choice (scanned layouts stay at 256: per-segment
        # chunk padding re-inflates with TE — measured 2412 vs 2314 ms/step
        # at 16M edges / 16 segments).
        chunk_edges=args.te or (
            768
            if args.kernel_precision == "default" and args.scan_segments <= 1
            else 256
        ),
        # bf16 takes TD=64 both unscanned (r3 TD sweep) and scanned (r5
        # q3+q5: +4.3-5.2% over TD=128 on every class); fp32 keeps 128.
        block_nodes=args.td or (
            64 if args.kernel_precision == "default" else 128
        ),
    )
    print(f"layout build: {time.perf_counter() - t0:.1f}s")
    emb = rng.standard_normal((n, args.emb_dim)).astype(np.float32)
    node_emb = jnp.asarray(pad_node_embeddings(emb, graph.num_nodes))

    mcfg = ModelConfig(
        in_dim=args.emb_dim, num_rel=r, gat_out_dim=args.feat,
        gat_heads=args.heads, gat_num_layers=args.layers, dropout=0.0,
        project_to_input_size=True, projection_layers=2,
        scorer_type="distmult", use_pallas=True, remat=args.remat,
        scan_segments=args.scan_segments,
        kernel_precision=args.kernel_precision,
    )
    tcfg = TrainConfig(
        train_batch_size=1024, num_neg=16, lr=1e-4, use_self_adv_neg=True,
        eval_ks_ranks=(1, 10), warmup_steps=0,
    )
    schedule = make_lr_schedule(tcfg.lr, "constant", 10_000, 0)
    optimizer = make_optimizer(tcfg, schedule)
    params = init_model(jax.random.PRNGKey(0), mcfg)
    state = create_train_state(params, optimizer, jax.random.PRNGKey(1))
    step_fn = make_train_step(mcfg, tcfg, optimizer, schedule)

    b = tcfg.train_batch_size
    batch = (
        jnp.asarray(rng.integers(0, n, b), jnp.int32),
        jnp.asarray(rng.integers(0, r, b), jnp.int32),
        jnp.asarray(rng.integers(0, n, b), jnp.int32),
        jnp.ones((b,), jnp.float32),
    )
    t0 = time.perf_counter()
    state, metrics = step_fn(state, node_emb, graph, *batch)
    loss = float(metrics["loss"])
    print(f"first step (incl compile): {time.perf_counter() - t0:.1f}s "
          f"loss={loss:.4f}")
    assert np.isfinite(loss)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, node_emb, graph, *batch)
    _ = float(metrics["loss"])
    spt = (time.perf_counter() - t0) / args.steps
    eps = e * args.layers / spt
    print(f"{e} edges, remat={args.remat}: {spt * 1e3:.1f} ms/step, "
          f"{eps / 1e6:.2f}M edge-messages/s")


if __name__ == "__main__":
    main()
