"""Op-level attribution of the src-blocked backward kernel on hardware.

VERDICT round 2, item 3: the backward measures ~19.4 ms kernel-only at the
1M-edge config vs a ~12.5 ms roofline (MXU passes + HBM streams), and the
~7 ms residual was *asserted* to be Mosaic scheduling/VPU overhead from a
single data point. This script measures it: the production kernel
(``ops/pallas/fused._bwd_src_kernel``) carries a compile-time ``ablate``
set that knocks out one named sub-computation at a time; the full-kernel
time minus the knockout time attributes the cost of each op on the real
chip (same grid, same streams, same Mosaic scheduling for everything else).

Knockouts (each removes ONLY the named op; consumers are fed live
substitutes so Mosaic cannot dead-code-eliminate upstream work):
  relgather  [TE,R]@[R,HF] relation-attention gather matmul
  gather     [TE,TD]@[TD,HF] in-kernel one-hot source row-select matmul
  sddmm      [TE,HF]@[HF,H] logit recompute matmul
  dalpha     [TE,HF]@[HF,H] <ps,g> matmul
  stats      packed-stream stat-column decode (m/l/S slices)
  vpu        exp/where/div alpha + de elementwise chain
  expand     the [TE,H]->[TE,HF] per-head lane broadcasts (3x)
  dh         [TD,TE]@[TE,HF] dh-partial matmul
  dh_rmw     the dh accumulate read-modify-write (store-only instead)
  dattn      [R,TE]@[TE,HF] dattn matmul
  dattn_rmw  the dattn += read-modify-write (store-only instead)
  dbias      per-chunk dbias reduction + RMW

``--forward`` profiles the forward kernel instead (its own residual:
~15.7 ms measured vs a ~7.7 ms MXU-pass model) with knockouts
  relgather / sddmm / lbias / agg  (the four matmuls)
  merge      running (m, l) flash-merge chain
  expand     the [*,H]->[*,HF] lane broadcasts (scales + denominator)
  out        output normalization (store raw accumulator)
  stats      the [TD,128] dense stats-lane compose+store

Usage: PYTHONPATH=. python scripts/tpu_bwd_profile.py [--precision default]
       (run alone: single TPU process rule)
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timeit(fn, sync, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "default"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--td", type=int, default=0,
                    help="blocked-layout dst/src block rows (0 = per-mode "
                         "production default, mirroring trainer.py)")
    ap.add_argument("--te", type=int, default=0,
                    help="blocked-layout chunk size (0 = per-mode "
                         "production default)")
    ap.add_argument("--forward", action="store_true",
                    help="profile the forward kernel instead")
    ap.add_argument(
        "--only", default=None,
        help="comma-separated knockouts to run (default: all)",
    )
    ap.add_argument(
        "--expand-mxu", action="store_true",
        help="swap the per-head VPU lane-broadcast _expand for a "
             "[X, H] @ [H, H*F] one-hot MXU matmul (HIGHEST: exact) and "
             "measure the whole kernel — the attribution says the VPU "
             "expand costs ~5.3 ms while each converted matmul should "
             "cost ~2.2 ms of MXU; this measures the actual trade.",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.expand_mxu:
        from relgat_projector_tpu.ops.pallas import fused as fused_mod

        # The expansion dot rides the RUN's precision: 6-pass exact at
        # HIGHEST (fp32 parity), 1-pass bf16 at DEFAULT (where the rest of
        # the kernel already tolerates bf16 rounding).
        _exp_prec = (
            jax.lax.Precision.DEFAULT
            if args.precision == "default"
            else jax.lax.Precision.HIGHEST
        )

        def _expand_mxu(a, heads, f, mxu_precision=None):
            # 4th arg matches fused._expand's signature (fused.py passes an
            # explicit per-call precision in the backward); this monkeypatch
            # deliberately pins the run-level precision instead.
            hf = heads * f
            row_h = jax.lax.broadcasted_iota(jnp.int32, (heads, hf), 0)
            col_h = jax.lax.broadcasted_iota(jnp.int32, (heads, hf), 1) // f
            em = (row_h == col_h).astype(jnp.float32)     # [H, H*F]
            return jnp.dot(
                a, em, preferred_element_type=jnp.float32,
                precision=_exp_prec,
            )

        fused_mod._expand = _expand_mxu

    import bench as B
    from relgat_projector_tpu.data.graph import build_graph
    from relgat_projector_tpu.ops.pallas.fused import (
        fused_relgat_forward,
        fused_relgat_backward_src,
    )
    from relgat_projector_tpu.ops.pallas.kernels import (
        _gather_ps,
        _packed_stream,
        _stream_dtype,
        _PRECISIONS,
    )

    cfg = B.BENCH
    precision = _PRECISIONS[args.precision]
    _n, src, dst, et, emb, *_ = B._make_inputs(cfg)
    td = args.td or (64 if args.precision == "default" else 128)
    te = args.te or (768 if args.precision == "default" else 256)
    print(f"layout: TD={td} TE={te}")
    graph = build_graph(
        src, dst, et, num_nodes=cfg["num_nodes"], blocked=True,
        block_nodes=td, chunk_edges=te,
    )
    blocked = graph.blocked
    heads, f = cfg["gat_heads"], cfg["gat_out_dim"]
    rng = np.random.default_rng(0)
    n_pad = blocked.num_nodes
    h = jnp.asarray(
        rng.standard_normal((n_pad, heads, f)).astype(np.float32)
    )
    attn = jnp.asarray(
        rng.standard_normal((heads, cfg["num_rel"], f)).astype(np.float32)
        * 0.3
    )
    rel_bias = jnp.asarray(
        rng.standard_normal((cfg["num_rel"],)).astype(np.float32) * 0.1
    )
    g = jnp.asarray(
        rng.standard_normal((n_pad, heads * f)).astype(np.float32)
    )

    # Forward once for the residuals; then precompute the backward's
    # kernel-only inputs exactly as kernels._segment_bwd does.
    ps = _gather_ps(h, blocked.by_dst.src, heads, f, _stream_dtype(precision))
    out_blocks, stats = jax.jit(
        lambda ps_, a_, b_: fused_relgat_forward(
            ps_, blocked.by_dst, a_, b_, with_stats=True,
            precision=precision,
        )
    )(ps, attn, rel_bias)
    packed = jax.jit(
        lambda g_, ob_, st_: _packed_stream(
            g_, ob_, st_, heads, f, precision=precision
        )
    )(g, out_blocks, stats)
    bs = blocked.by_src
    ge_all = jax.jit(lambda p_: jnp.take(p_, bs.dst, axis=0))(packed)
    hb = jax.jit(
        lambda h_: jnp.pad(
            h_.reshape(n_pad, heads * f).astype(_stream_dtype(precision)),
            ((0, bs.num_blocks * bs.block_nodes - n_pad), (0, 0)),
        )
    )(h)

    def sync_any(x):
        # Fetch ONE element (device-side slice first): device_get of a whole
        # leaf ships it through the relay — the forward's smallest leaf is
        # the 12.8 MB stats array, which inflated its timings by ~30%.
        leaf = min(jax.tree_util.tree_leaves(x), key=lambda a: a.size)
        _ = float(leaf.ravel()[0])

    if args.forward:
        def run(ablate):
            fn = jax.jit(
                lambda ps_, a_, b_: fused_relgat_forward(
                    ps_, blocked.by_dst, a_, b_, with_stats=True,
                    precision=precision, ablate=frozenset(ablate),
                )
            )
            return _timeit(lambda: fn(ps, attn, rel_bias), sync_any,
                           args.steps)

        knockouts = [
            "relgather", "sddmm", "lbias", "agg", "merge", "expand",
            "out", "stats",
        ]
        skeleton = knockouts
    else:
        def run(ablate):
            fn = jax.jit(
                lambda hb_, ge_, a_: fused_relgat_backward_src(
                    hb_, ge_, bs, a_, precision=precision,
                    ablate=frozenset(ablate),
                )
            )
            return _timeit(lambda: fn(hb, ge_all, attn), sync_any,
                           args.steps)

        knockouts = [
            "relgather", "gather", "sddmm", "dalpha", "stats", "vpu",
            "expand", "dh", "dh_rmw", "dattn", "dattn_rmw", "dbias",
        ]
        skeleton = [
            "relgather", "gather", "sddmm", "dalpha", "stats", "vpu",
            "expand", "dh", "dattn", "dbias",
        ]
    if args.only:
        knockouts = [k for k in args.only.split(",") if k]

    t_full = run([])
    which = "fwd" if args.forward else "bwd"
    print(f"\n== {which} kernel-only attribution ({args.precision}, "
          f"{cfg['num_edges']} edges) ==")
    print(f"{'full kernel':28s} {t_full * 1e3:8.2f} ms")
    rows = []
    for k in knockouts:
        t_k = run([k])
        rows.append((k, t_k, t_full - t_k))
        print(f"-{k:27s} {t_k * 1e3:8.2f} ms   (op cost {1e3 * (t_full - t_k):+7.2f} ms)",
              flush=True)

    # Skeleton: streams + grid only (every knockout at once).
    t_skel = run(skeleton)
    print(f"{'skeleton (streams+grid)':28s} {t_skel * 1e3:8.2f} ms")
    total_attr = sum(d for _, _, d in rows)
    print(f"{'sum of op costs':28s} {total_attr * 1e3:8.2f} ms "
          f"(+skeleton = {(total_attr + t_skel) * 1e3:.2f} vs full "
          f"{t_full * 1e3:.2f})")


if __name__ == "__main__":
    main()
