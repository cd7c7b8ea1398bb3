"""Component-level breakdown of the full train step on the real chip.

VERDICT round 1, item 3: ~60% of the 1M-edge step time lived outside the
fused kernels with no committed attribution. This script times each stage
of the step separately (jitted pieces, host-transfer synchronized — NB
``block_until_ready`` is a no-op on this platform) and prints a table to
paste into BENCH_NOTES.md.

Usage: PYTHONPATH=. python scripts/tpu_profile.py [--small]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timeit(fn, sync, steps=10, warmup=2):
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
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--kernel-precision", default="highest",
                    choices=["highest", "default"])
    ap.add_argument("--td", type=int, default=0,
                    help="dst-block rows (0 = layout auto-tuner)")
    ap.add_argument("--te", type=int, default=0,
                    help="edge-chunk size (0 = layout auto-tuner)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from relgat_projector_tpu.config import ModelConfig, TrainConfig
    from relgat_projector_tpu.data.graph import build_graph, pad_node_embeddings
    from relgat_projector_tpu.models.model import init_model, single_gat_step
    from relgat_projector_tpu.schedules import make_lr_schedule
    from relgat_projector_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from relgat_projector_tpu.train.step import batch_forward, make_train_step

    cfg_d = B.BENCH_SMALL if args.small else B.BENCH
    _n, src, dst, et, emb, bs, br, bd = B._make_inputs(cfg_d)
    # Layout = the auto-tuner's pick for this graph/mode (0 = auto), exactly
    # what bench.py and the trainer run — round 4 proved hardcoded layout
    # mirrors go stale the moment the anchors move (--td/--te override).
    td, te = args.td, args.te
    if not (td and te):
        from relgat_projector_tpu.data.layout_tuner import pick_layout

        choice = pick_layout(
            src, dst, cfg_d["num_nodes"],
            kernel_precision=args.kernel_precision,
            heads_features=cfg_d["gat_heads"] * cfg_d["gat_out_dim"],
            num_rel=cfg_d["num_rel"],
        )
        td = td or choice.block_nodes
        te = te or choice.chunk_edges
    print(f"layout: TD={td} TE={te}")
    graph = build_graph(
        src, dst, et, num_nodes=cfg_d["num_nodes"], blocked=True,
        chunk_edges=te, block_nodes=td,
    )
    node_emb = jnp.asarray(pad_node_embeddings(emb, graph.num_nodes))
    mcfg = ModelConfig(
        in_dim=cfg_d["emb_dim"], num_rel=cfg_d["num_rel"],
        gat_out_dim=cfg_d["gat_out_dim"], gat_heads=cfg_d["gat_heads"],
        gat_num_layers=cfg_d["gat_num_layers"], dropout=0.0,
        project_to_input_size=True, projection_layers=2,
        scorer_type="distmult", use_pallas=True,
        kernel_precision=args.kernel_precision,
    )
    tcfg = TrainConfig(
        train_batch_size=cfg_d["batch_size"], num_neg=cfg_d["num_neg"],
        lr=1e-4, use_self_adv_neg=True, eval_ks_ranks=(1, 10),
        warmup_steps=0,
    )
    schedule = make_lr_schedule(tcfg.lr, "constant", 10_000, 0)
    optimizer = make_optimizer(tcfg, schedule)
    params = init_model(jax.random.PRNGKey(0), mcfg)
    # Fresh buffers for the donated full-step piece (donation would delete
    # the params used by the other pieces).
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), optimizer,
        jax.random.PRNGKey(1),
    )
    batch = (
        jnp.asarray(bs), jnp.asarray(br), jnp.asarray(bd),
        jnp.ones((cfg_d["batch_size"],), jnp.float32),
    )
    rng = jax.random.PRNGKey(3)
    class _Rows(list):
        """Print each row as it lands so a crash mid-script (e.g. a
        layout/precision combination that legitimately OOMs) keeps the
        already-measured rows in the log."""

        def append(self, item):
            name, t = item
            print(f"[row] {name:45s} {t * 1e3:9.2f} ms", flush=True)
            super().append(item)

    rows = _Rows()

    def sync_any(x):
        # Smallest leaf: device_get transfers the WHOLE array through the
        # (slow) relay, so syncing on e.g. a [N,H,F] grad would swamp the
        # measurement; the smallest leaf (a bias/scalar) costs ~nothing and
        # still orders after every queued dispatch on this single stream.
        leaf = min(jax.tree_util.tree_leaves(x), key=lambda a: a.size)
        _ = np.asarray(jax.device_get(leaf)).ravel()[:1]

    # --- full step (non-donated state so we can reuse it) ---------------
    step_fn = make_train_step(mcfg, tcfg, optimizer, schedule)
    s_run = [state]

    def full_step():
        s, m = step_fn(s_run[0], node_emb, graph, *batch)
        s_run[0] = s
        return m["loss"]

    t_full = _timeit(full_step, sync_any, args.steps)
    rows.append(("full train step (fwd+bwd+Adam)", t_full))

    # --- loss+grad only -------------------------------------------------
    @jax.jit
    def loss_grad(p):
        def f(p_):
            l, _ = batch_forward(
                p_, mcfg, tcfg, node_emb, graph, *batch, rng=rng, train=True
            )
            return l
        return jax.value_and_grad(f)(p)

    t_lg = _timeit(lambda: loss_grad(params), sync_any, args.steps)
    rows.append(("loss + grad (no optimizer)", t_lg))

    # --- forward only ---------------------------------------------------
    @jax.jit
    def fwd_only(p):
        l, _ = batch_forward(
            p, mcfg, tcfg, node_emb, graph, *batch, rng=rng, train=True
        )
        return l

    t_f = _timeit(lambda: fwd_only(params), sync_any, args.steps)
    rows.append(("forward only (full loss)", t_f))

    # --- GAT stack fwd / fwd+bwd ---------------------------------------
    @jax.jit
    def gat_fwd(p):
        return jnp.sum(single_gat_step(
            p, mcfg, node_emb, graph, train=False, rng=None
        ))

    t_gf = _timeit(lambda: gat_fwd(params), sync_any, args.steps)
    rows.append(("GAT stack fwd (layers + projection)", t_gf))

    @jax.jit
    def gat_fwdbwd(p):
        return jax.grad(
            lambda p_: jnp.sum(single_gat_step(
                p_, mcfg, node_emb, graph, train=False, rng=None
            ))
        )(p)

    t_gfb = _timeit(lambda: gat_fwdbwd(params), sync_any, args.steps)
    rows.append(("GAT stack fwd+bwd", t_gfb))

    # --- propagate-only kernel (one layer, pre-projected h) -------------
    from relgat_projector_tpu.ops.pallas.kernels import relgat_propagate_pallas

    heads, f = mcfg.gat_heads, mcfg.gat_out_dim
    h1 = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (graph.num_nodes, heads, f)
        ).astype(np.float32)
    )
    attn_b = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (heads, mcfg.num_rel, f)
        ).astype(np.float32) * 0.3
    )
    bias_b = jnp.zeros((mcfg.num_rel,), jnp.float32)

    @jax.jit
    def prop_fwd(h_, a_, b_):
        # kernel_precision must ride along: the bf16-mode layouts (e.g.
        # (128,1536)) are only VMEM-feasible with bf16 streams — the fp32
        # default scoped-VMEM-OOMs at exactly those tiles.
        return jnp.sum(
            relgat_propagate_pallas(
                h_, a_, b_, graph.blocked,
                kernel_precision=args.kernel_precision,
            )
        )

    t_pf = _timeit(lambda: prop_fwd(h1, attn_b, bias_b), sync_any, args.steps)
    rows.append(("propagate fwd (1 layer, kernel+gather)", t_pf))

    @jax.jit
    def prop_fwdbwd(h_, a_, b_):
        return jax.grad(
            lambda *xs: jnp.sum(relgat_propagate_pallas(
                *xs, graph.blocked,
                kernel_precision=args.kernel_precision,
            ))
        , argnums=(0, 1, 2))(h_, a_, b_)

    t_pfb = _timeit(
        lambda: prop_fwdbwd(h1, attn_b, bias_b), sync_any, args.steps
    )
    rows.append(("propagate fwd+bwd (1 layer)", t_pfb))

    # --- projection + scoring + loss given x ----------------------------
    d_sc = mcfg.scorer_dim
    x_fake = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (graph.num_nodes, mcfg.gat_concat_dim)
        ).astype(np.float32)
    )

    from relgat_projector_tpu.models.projection import apply_projection_head
    from relgat_projector_tpu.models import scorer as SC

    def head_loss(p, x):
        xp = apply_projection_head(
            p["projection"], x, train=False, rng=None
        ) if mcfg.project_to_input_size else x
        sv = jnp.take(xp, batch[0], axis=0)
        dv = jnp.take(xp, batch[2], axis=0)
        pos = SC.score_triplets(p["scorer"], mcfg.scorer_type, sv, batch[1], dv)
        return jnp.sum(pos)

    @jax.jit
    def proj_fwdbwd(p, x):
        return jax.grad(head_loss, argnums=0)(p, x)

    t_pj = _timeit(lambda: proj_fwdbwd(params, x_fake), sync_any, args.steps)
    rows.append(("projection+scoring fwd+bwd (given x)", t_pj))

    # --- optimizer alone ------------------------------------------------
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def opt_only(s, g):
        updates, new_os = optimizer.update(g, s.opt_state, s.params)
        import optax
        return optax.apply_updates(s.params, updates), new_os

    t_o = _timeit(lambda: opt_only(s_run[0], grads), sync_any, args.steps)
    rows.append(("optimizer update alone", t_o))

    print("\n== component breakdown ({} config) ==".format(
        "small" if args.small else "1M-edge"
    ))
    for name, t in rows:
        print(f"{name:45s} {t * 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
