"""Real-TPU validation of the fused Pallas kernels vs the XLA baseline.

Interpret-mode (CPU) tests do NOT catch Mosaic miscompiles, so every kernel
change runs this on the chip: forward + full gradients, with and without
in-kernel attention dropout (the hash-mask ops — int32 multiply / logical
shift — are exactly the kind of thing that can lower differently in
Mosaic).

Usage: python scripts/tpu_kernel_check.py [--edges 200000]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=200_000)
    ap.add_argument("--nodes", type=int, default=20_000)
    ap.add_argument("--rel", type=int, default=12)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--te", type=int, default=256,
                    help="blocked-layout chunk size (the bf16 production "
                         "default is 768; different TE = different Mosaic "
                         "BlockSpecs, so validate each)")
    ap.add_argument("--td", type=int, default=128,
                    help="blocked-layout dst-block rows (bf16 production "
                         "default is 64)")
    ap.add_argument(
        "--precision", default="highest",
        choices=("highest", "high", "default"),
        help="Pallas kernel MXU precision; with 'default' (1-pass bf16) "
        "errors vs the fp32 XLA baseline are reported, not asserted",
    )
    args = ap.parse_args()
    exact = args.precision != "default"

    import jax
    import jax.numpy as jnp

    from relgat_projector_tpu.data.graph import build_graph
    from relgat_projector_tpu.ops.pallas.kernels import (
        relgat_propagate_pallas,
    )
    from relgat_projector_tpu.ops.relgat_ops import relgat_propagate

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    n, e, r = args.nodes, args.edges, args.rel
    heads, f = args.heads, args.feat
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = rng.integers(0, r, e).astype(np.int32)
    g = build_graph(src, dst, et, n, blocked=True, chunk_edges=args.te,
                    block_nodes=args.td)
    n_pad = g.num_nodes
    h = jnp.asarray(rng.standard_normal((n_pad, heads, f)).astype(np.float32))
    attn = jnp.asarray(
        (rng.standard_normal((heads, r, f)) * 0.3).astype(np.float32)
    )
    bias = jnp.asarray((rng.standard_normal(r) * 0.1).astype(np.float32))
    key = jax.random.PRNGKey(7)

    for rate in (0.0, 0.3):
        kw = dict(attn_dropout_rate=rate, dropout_rng=key if rate else None)
        pkw = dict(kw, kernel_precision=args.precision)
        t0 = time.perf_counter()
        want = relgat_propagate(
            h, attn, bias, g.src, g.dst, g.etype, num_nodes=n_pad,
            edges_sorted_by_dst=True, **kw,
        )
        _ = float(want.sum())
        got = relgat_propagate_pallas(h, attn, bias, g.blocked, **pkw)
        _ = float(got.sum())
        fw_err = float(
            jnp.max(jnp.abs(got[:n] - want[:n]))
            / jnp.maximum(jnp.max(jnp.abs(want[:n])), 1e-9)
        )
        print(f"rate={rate} fwd rel-err {fw_err:.3e} "
              f"({time.perf_counter() - t0:.1f}s incl compile)")
        if exact:
            assert fw_err < 1e-5, f"FWD mismatch at rate={rate}"

        def loss_p(h_, a_, b_):
            return jnp.sum(jnp.sin(relgat_propagate_pallas(
                h_, a_, b_, g.blocked, **pkw)[:n]))

        def loss_x(h_, a_, b_):
            return jnp.sum(jnp.sin(relgat_propagate(
                h_, a_, b_, g.src, g.dst, g.etype, num_nodes=n_pad,
                edges_sorted_by_dst=True, **kw)[:n]))

        t0 = time.perf_counter()
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(h, attn, bias)
        _ = float(gp[0].sum())
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(h, attn, bias)
        _ = float(gx[0].sum())
        for name, a, b in zip(("dh", "dattn", "dbias"), gp, gx):
            scale = float(jnp.maximum(jnp.max(jnp.abs(b)), 1e-9))
            err = float(jnp.max(jnp.abs(a - b))) / scale
            print(f"  rate={rate} {name} rel-err {err:.3e}")
            if exact:
                assert err < 5e-5, f"{name} mismatch at rate={rate}"
        print(f"  grads OK ({time.perf_counter() - t0:.1f}s incl compile)")

    print("TPU KERNEL CHECK PASSED")


if __name__ == "__main__":
    main()
