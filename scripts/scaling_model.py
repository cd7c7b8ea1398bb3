"""Scaling-efficiency model for the halo path (BASELINE.md >=80% target).

Only ONE physical chip is reachable from this image, so the 1-chip -> N-chip
scaling target cannot be timed directly. This script commits the next-best
evidence, built from measured quantities:

- **comm volume is measured, not estimated**: ``build_halo_graph`` computes
  the exact per-device boundary buffer (``halo_pair``) for the bench-scale
  graph at each shard count — the same static plan the trainer executes on
  a real mesh (``parallel/halo.py``),
- **compute rate is measured**: the single-chip bench headline
  (``bench.py``, recorded in BENCH_NOTES.md),
- only the interconnect speed is a spec parameter (``--ici-gbps``; default
  45 GB/s one-way per device — one v5e ICI link; a 2D-torus all_to_all has
  more than one link available, so this is conservative).

Model, per train step on G devices (edges and dst rows split ~evenly by
the contiguous-dst partition; the triplet batch is data-parallel):

    compute(G) = T_step(1) / G
    comm(G)    = num_layers * 2 * (G-1) * halo_pair * H*F*4 / ICI_BW
                 (boundary rows forward + boundary cotangents backward)
    T(G)       = max(compute, comm)   with comm/compute overlap (default)
               = compute + comm       serialized (worst case)

    efficiency(G) = T(1) / (G * T(G))

Two graph families bracket reality: a clustered graph (5% cross-partition
edges — what a min-cut partitioner produces on real KGs; the WordNet-like
graphs the reference targets are strongly clustered) and a uniform random
graph (no locality at all — the worst case for ANY partitioner).

Usage: PYTHONPATH=. python scripts/scaling_model.py [--msg-rate 15.79e6]
"""

from __future__ import annotations

import argparse

import numpy as np


def make_clustered(n, e, g_clusters, cross_frac, num_rel, seed=0):
    """Edges clustered into ``g_clusters`` contiguous node ranges with
    ``cross_frac`` of them crossing clusters uniformly."""
    rng = np.random.default_rng(seed)
    rows = n // g_clusters
    e_per = e // g_clusters
    e_cross = int(e_per * cross_frac)
    e_local = e_per - e_cross
    srcs, dsts = [], []
    for d in range(g_clusters):
        lo = d * rows
        dsts.append(rng.integers(lo, lo + rows, e_local + e_cross))
        srcs.append(np.concatenate([
            rng.integers(lo, lo + rows, e_local),
            rng.integers(0, n, e_cross),
        ]))
    src = np.concatenate(srcs).astype(np.int64)
    dst = np.concatenate(dsts).astype(np.int64)
    et = rng.integers(0, num_rel, src.shape[0]).astype(np.int64)
    return src, dst, et


def make_uniform(n, e, num_rel, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, n, e).astype(np.int64),
        rng.integers(0, n, e).astype(np.int64),
        rng.integers(0, num_rel, e).astype(np.int64),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--num-rel", type=int, default=40)
    ap.add_argument("--cross-frac", type=float, default=0.05)
    ap.add_argument("--msg-rate", type=float, default=15.79e6,
                    help="measured 1-chip edge-messages/s (bench.py)")
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="one-way per-device ICI bandwidth, GB/s")
    ap.add_argument("--shards", type=int, nargs="+",
                    default=[2, 4, 8, 16])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from relgat_projector_tpu.parallel.halo import build_halo_graph

    feat_bytes = args.heads * args.feat * 4
    t1 = args.edges * args.layers / args.msg_rate  # measured 1-chip step
    bw = args.ici_gbps * 1e9

    print(f"1-chip step (measured, bench.py): {t1 * 1e3:.1f} ms "
          f"({args.msg_rate / 1e6:.2f}M msg/s), boundary row = "
          f"{feat_bytes} B, ICI = {args.ici_gbps:.0f} GB/s one-way")
    header = ("| graph | G | halo rows/pair | comm MB/step/dev | "
              "repl MB/step/dev | comm ms | compute ms | eff(overlap) | "
              "eff(serial) |")
    print()
    print(header)
    print("|" + "---|" * 9)

    # "shuffled+partitioner": the clustered graph with node ids arriving in
    # random order (indistinguishable from uniform to the contiguous-range
    # partition), relabeled by data/partition.py — the situation a real KG
    # export is in, and the case the partitioner exists for.
    c_src, c_dst, c_et = make_clustered(
        args.nodes, args.edges, max(args.shards), args.cross_frac,
        args.num_rel,
    )
    shuf = np.random.default_rng(7).permutation(args.nodes)

    def partitioned(g):
        from relgat_projector_tpu.data.partition import (
            partition_node_permutation,
        )
        from relgat_projector_tpu.parallel.halo import halo_rows_per_shard

        rows = halo_rows_per_shard(args.nodes, g)
        perm, stats = partition_node_permutation(
            shuf[c_src], shuf[c_dst], args.nodes, g, rows
        )
        return perm[shuf[c_src]], perm[shuf[c_dst]], c_et

    for label, edges_of_g in (
        ("clustered 5%", lambda g: (c_src, c_dst, c_et)),
        ("shuffled+partitioner", partitioned),
        ("shuffled, no partitioner",
         lambda g: (shuf[c_src], shuf[c_dst], c_et)),
        ("uniform",
         lambda g, e=make_uniform(args.nodes, args.edges, args.num_rel):
         e),
    ):
        for g in args.shards:
            src, dst, et = edges_of_g(g)
            hg = build_halo_graph(src, dst, et, args.nodes, g)
            comm_bytes = (
                args.layers * 2 * hg.exchange_bytes_per_device(feat_bytes)
            )
            repl_bytes = (
                args.layers * 2 * hg.replication_bytes_per_device(feat_bytes)
            )
            compute = t1 / g
            comm = comm_bytes / bw
            t_overlap = max(compute, comm)
            t_serial = compute + comm
            print(
                f"| {label} | {g} | {hg.halo_pair} "
                f"| {comm_bytes / 1e6:.1f} | {repl_bytes / 1e6:.1f} "
                f"| {comm * 1e3:.2f} | {compute * 1e3:.2f} "
                f"| {t1 / (g * t_overlap) * 100:.0f}% "
                f"| {t1 / (g * t_serial) * 100:.0f}% |"
            )


if __name__ == "__main__":
    main()
