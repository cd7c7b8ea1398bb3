"""Refit the layout-tuner cost constants from tpu_layout_sweep.py output.

The sweep measures the fused fwd+bwd propagate at candidate layouts over
4 graph classes x 2 modes on the real chip; this script least-squares the
tuner's cost form  t = K + A*C + B*S + G*TD*S + H*TE*S  per mode against
those measurements (C/S recomputed exactly for each graph+layout), prints
the fitted constants + per-point residuals, and replays the auto-pick
against each combo's measured table (the <=5% acceptance check).

Usage: PYTHONPATH=. python scripts/fit_layout_model.py [sweep.json]
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from relgat_projector_tpu.data.layout_tuner import _chunks_slots  # noqa: E402


def graphs():
    # MUST mirror scripts/tpu_layout_sweep.py exactly (same rng sequence).
    rng = np.random.default_rng(0)
    n, e = 50_000, 500_000
    yield "uniform", n, rng.integers(0, n, e), rng.integers(0, n, e)
    p = 1.0 / np.arange(1, n + 1) ** 1.0
    p /= p.sum()
    yield "zipf1.0", n, rng.integers(0, n, e), rng.choice(n, size=e, p=p)
    cs = 500
    src_c = rng.integers(0, n, e)
    intra = rng.random(e) < 0.9
    off = rng.integers(0, cs, e)
    dst_c = np.where(intra, (src_c // cs) * cs + off, rng.integers(0, n, e))
    yield "clustered", n, src_c, dst_c
    nd = 12_500
    yield "dense40", nd, rng.integers(0, nd, e), rng.integers(0, nd, e)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "reval_r4/layout_sweep.json"
    data = json.loads(open(path).read())
    gmap = {name: (n, src, dst) for name, n, src, dst in graphs()}

    for mode in ("highest", "default"):
        rows, y, tags = [], [], []
        for gname, (n, src, dst) in gmap.items():
            combo = data.get(f"{gname}/{mode}")
            if not combo:
                continue
            for lk, r in combo["layouts"].items():
                td, te = map(int, lk.split("x"))
                cd, sd = _chunks_slots(dst, n, td, te)
                cs_, ss = _chunks_slots(src, n, td, te)
                c, s = cd + cs_, sd + ss
                rows.append(
                    [1.0, c * 1e-6, s * 1e-6, td * s * 1e-9, te * s * 1e-9]
                )
                y.append(r["ms"])
                tags.append((gname, td, te))
        A = np.array(rows)
        yv = np.array(y)
        coef, *_ = np.linalg.lstsq(A, yv, rcond=None)
        pred = A @ coef
        err = (pred - yv) / yv
        print(f"\n== {mode}: K={coef[0]:.2f} A={coef[1]:.2f} "
              f"B={coef[2]:.3f} G={coef[3]:.3f} H={coef[4]:.3f} "
              f"(n={len(yv)}, max|err|={np.abs(err).max()*100:.1f}%)")
        for (g, td, te), p, t in sorted(zip(tags, pred, yv)):
            print(f"   {g:10s} TD={td:3d} TE={te:4d}: meas {t:7.2f} "
                  f"model {p:7.2f} ({100*(p-t)/t:+5.1f}%)")

        # Replay the pick against each combo's measured table.
        print(f"   -- pick replay ({mode}) --")
        for gname, (n, src, dst) in gmap.items():
            combo = data.get(f"{gname}/{mode}")
            if not combo:
                continue
            scored = []
            for lk in combo["layouts"]:
                td, te = map(int, lk.split("x"))
                cd, sd = _chunks_slots(dst, n, td, te)
                cs_, ss = _chunks_slots(src, n, td, te)
                c, s = cd + cs_, sd + ss
                m = (coef[0] + coef[1] * c * 1e-6 + coef[2] * s * 1e-6
                     + coef[3] * td * s * 1e-9 + coef[4] * te * s * 1e-9)
                scored.append((m, lk))
            pick = min(scored)[1]
            meas = combo["layouts"]
            best = min(meas, key=lambda k: meas[k]["ms"])
            gap = meas[pick]["ms"] / meas[best]["ms"] - 1
            print(f"   {gname:10s}: model-pick {pick} ({meas[pick]['ms']:.2f}"
                  f" ms) vs best {best} ({meas[best]['ms']:.2f} ms) "
                  f"gap {gap*100:+.1f}% {'OK' if gap <= 0.05 else 'MISS'}")


if __name__ == "__main__":
    main()
