"""On-chip validation of the blocked-layout auto-tuner (VERDICT r3 #2).

For each graph class (uniform, zipf-1.0, clustered, dense avg-deg-40) and
each kernel mode (fp32 "highest", bf16 "default"), measures the fused
fwd+bwd propagate step at the tuner's top-ranked candidate layouts plus
fixed baselines, then checks the auto-pick lands within 5% of the swept
best. Results -> reval_r4/layout_sweep.json (incremental, resumable).

Each (layout, mode) pair is a fresh Mosaic compile through the
remote-compile relay (minutes); run in the background and do NOT run a
second TPU process concurrently.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/tpu_layout_sweep.py
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

OUT = Path("reval_r4/layout_sweep.json")

N_TIME = 12          # timed dispatches per layout
HEADS, FEAT, R = 4, 64, 8


def graphs():
    rng = np.random.default_rng(0)
    n, e = 50_000, 500_000
    yield "uniform", n, rng.integers(0, n, e), rng.integers(0, n, e)

    p = 1.0 / np.arange(1, n + 1) ** 1.0
    p /= p.sum()
    yield "zipf1.0", n, rng.integers(0, n, e), rng.choice(n, size=e, p=p)

    # Clustered: 100 clusters of 500 nodes, 90% intra-cluster edges.
    cs = 500
    src_c = rng.integers(0, n, e)
    intra = rng.random(e) < 0.9
    off = rng.integers(0, cs, e)
    dst_c = np.where(intra, (src_c // cs) * cs + off, rng.integers(0, n, e))
    yield "clustered", n, src_c, dst_c

    nd = 12_500  # avg degree 40
    yield "dense40", nd, rng.integers(0, nd, e), rng.integers(0, nd, e)


def time_layout(src, dst, n, td, te, mode):
    import jax
    import jax.numpy as jnp

    from relgat_projector_tpu.data.graph import build_graph
    from relgat_projector_tpu.ops.pallas.kernels import (
        relgat_propagate_pallas,
    )

    rng = np.random.default_rng(1)
    et = rng.integers(0, R, src.shape[0]).astype(np.int32)
    g = build_graph(src.astype(np.int32), dst.astype(np.int32), et, n,
                    blocked=True, chunk_edges=te, block_nodes=td)
    h = jnp.asarray(
        rng.standard_normal((g.num_nodes, HEADS, FEAT)).astype(np.float32)
    )
    attn = jnp.asarray(
        (rng.standard_normal((HEADS, R, FEAT)) * 0.3).astype(np.float32)
    )
    bias = jnp.asarray((rng.standard_normal(R) * 0.1).astype(np.float32))

    def loss(h_, a_, b_):
        return jnp.sum(jnp.sin(relgat_propagate_pallas(
            h_, a_, b_, g.blocked, kernel_precision=mode)[:n]))

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    t0 = time.perf_counter()
    v, gr = step(h, attn, bias)
    _ = float(v)  # host sync (block_until_ready is a no-op here)
    compile_s = time.perf_counter() - t0
    times = []
    for _i in range(N_TIME):
        t0 = time.perf_counter()
        v, gr = step(h, attn, bias)
        _ = float(v) + float(gr[0][0, 0, 0])
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times)), compile_s


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    from relgat_projector_tpu.data.layout_tuner import pick_layout

    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    for gname, n, src, dst in graphs():
        for mode in ("highest", "default"):
            key = f"{gname}/{mode}"
            done = results.get(key, {"layouts": {}})
            choice = pick_layout(src, dst, n, kernel_precision=mode,
                                 heads_features=HEADS * FEAT, num_rel=R)
            done["auto_pick"] = [choice.block_nodes, choice.chunk_edges]
            done["model_table"] = [list(r) for r in choice.table]
            # Candidates: model's top-4 + fixed baselines.
            ranked = sorted(choice.table, key=lambda r: r[2])[:4]
            cands = {(td, te) for td, te, _ in ranked}
            cands.add((128, 256))
            if mode == "default":
                cands.add((64, 768))
            for td, te in sorted(cands):
                lk = f"{td}x{te}"
                if lk in done["layouts"]:
                    continue
                ms, comp = time_layout(src, dst, n, td, te, mode)
                done["layouts"][lk] = {"ms": ms, "compile_s": comp}
                print(f"[{key}] TD={td} TE={te}: {ms:.2f} ms "
                      f"(compile {comp:.0f}s)", flush=True)
                results[key] = done
                OUT.write_text(json.dumps(results, indent=1))
            best_lk = min(done["layouts"], key=lambda k: done["layouts"][k]["ms"])
            best = done["layouts"][best_lk]["ms"]
            pick_lk = f"{choice.block_nodes}x{choice.chunk_edges}"
            pick_ms = done["layouts"][pick_lk]["ms"]
            gap = pick_ms / best - 1
            done["pick_ms"] = pick_ms
            done["best"] = [best_lk, best]
            done["pick_within_5pct"] = bool(gap <= 0.05)
            print(f"[{key}] auto={pick_lk} {pick_ms:.2f} ms, best={best_lk} "
                  f"{best:.2f} ms, gap {gap*100:+.1f}% "
                  f"{'OK' if gap <= 0.05 else 'MISS'}", flush=True)
            results[key] = done
            OUT.write_text(json.dumps(results, indent=1))
    n_ok = sum(1 for v in results.values() if v.get("pick_within_5pct"))
    print(f"DONE: {n_ok}/{len(results)} combos within 5%")


if __name__ == "__main__":
    main()
