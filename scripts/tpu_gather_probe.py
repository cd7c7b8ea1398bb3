"""Probe: gather bounds-handling cost on the per-edge source gather.

The blocked layouts guarantee every src/dst index is in bounds by
construction (padded edges point at the padded node row), yet
``jnp.take``'s default ``mode='fill'`` carries an OOB clamp+select on
every gathered row. This times the [E_bp] x [N, H*F] row gather — the
step's dominant non-kernel cost (BENCH_NOTES) — under each mode, fp32
and bf16, on the real chip.

Usage: PYTHONPATH=. python scripts/tpu_gather_probe.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, e, hf = 100_000, 1_204_224, 256  # bench-scale padded edge count
    idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    x32 = jnp.asarray(rng.standard_normal((n, hf)).astype(np.float32))

    def timeit(fn, *args, steps=20):
        out = fn(*args)
        float(out[0, 0])  # sync via host transfer (block_until_ready no-op)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(out[0, 0])
        return (time.perf_counter() - t0) / steps

    for dtype, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        x = x32.astype(dtype)
        for mode in ("fill", "clip"):
            f = jax.jit(lambda a, i, m=mode: jnp.take(a, i, axis=0, mode=m))
            t = timeit(f, x, idx)
            print(f"{tag} take mode={mode:18s} {t * 1e3:7.2f} ms",
                  flush=True)
        # jnp.take only accepts numpy modes; promise_in_bounds rides the
        # .at[].get indexed-access API (lax GatherScatterMode).
        for mode in ("promise_in_bounds", "clip"):
            g = jax.jit(lambda a, i, m=mode: a.at[i].get(mode=m))
            t = timeit(g, x, idx)
            print(f"{tag} at[].get mode={mode:14s} {t * 1e3:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
