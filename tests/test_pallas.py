"""Pallas kernel path (interpret mode on CPU): blocked layout invariants,
forward parity vs the XLA baseline, gradient parity through the custom VJP,
and the full model with ``use_pallas=True``."""

import numpy as np
import jax
import jax.numpy as jnp

from relgat_projector_tpu.config import ModelConfig
from relgat_projector_tpu.data.blocked import build_blocked_graph
from relgat_projector_tpu.data.graph import build_graph, pad_node_embeddings
from relgat_projector_tpu.models.model import init_model, single_gat_step
from relgat_projector_tpu.ops.pallas import relgat_propagate_pallas
from relgat_projector_tpu.ops.relgat_ops import relgat_propagate


def _random_case(n=150, e=900, r=7, heads=3, f=16, seed=0, td=16, te=64):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = rng.integers(0, r, e).astype(np.int32)
    blocked = build_blocked_graph(
        src, dst, et, num_nodes=n, block_nodes=td, chunk_edges=te
    )
    h = jnp.asarray(rng.standard_normal((n, heads, f)).astype(np.float32))
    attn = jnp.asarray(
        (rng.standard_normal((heads, r, f)) * 0.3).astype(np.float32)
    )
    bias = jnp.asarray((rng.standard_normal(r) * 0.1).astype(np.float32))
    return src, dst, et, blocked, h, attn, bias, n


def test_blocked_layout_invariants():
    """Host-dict-level builder invariants (the device dataclass now ships
    only the runtime arrays; everything else lives in the host layout
    dicts + chunk_meta)."""
    from relgat_projector_tpu.data.blocked import _build_one_np

    src, dst, et, bg, *_ = _random_case()
    td, te = bg.by_dst.block_nodes, bg.by_dst.chunk_edges
    bd = _build_one_np(
        dst.astype(np.int64), src.astype(np.int64), dst.astype(np.int64),
        et.astype(np.int64), bg.num_nodes, td, te,
    )
    d = bd["dst"]
    m = bd["mask"]
    assert (np.diff(d) >= 0).all()  # global dst-sortedness incl. padding
    assert bg.by_dst.num_slots % te == 0
    assert m.sum() == 900
    # every chunk's edges belong to exactly its block
    cb = bd["chunk_block"]
    np.testing.assert_array_equal(cb, np.asarray(bg.by_dst.chunk_block))
    for c in range(cb.shape[0]):
        sl = slice(c * te, (c + 1) * te)
        assert (d[sl] // td == cb[c]).all()
    # real edges form the same multiset as the input
    real = m > 0
    got = sorted(zip(bd["src"][real], d[real], bd["etype"][real]))
    want = sorted(zip(src, dst, et))
    assert got == want
    # local_seg consistent, and it is what chunk_meta row 1 carries
    np.testing.assert_array_equal(bd["local_seg"], d - (d // td) * td)
    meta = np.asarray(bg.by_dst.chunk_meta)
    np.testing.assert_array_equal(
        meta[:, 1, :].reshape(-1), bd["local_seg"]
    )
    np.testing.assert_array_equal(meta[:, 0, :].reshape(-1), bd["etype"])
    np.testing.assert_array_equal(meta[:, 2, :].reshape(-1), m.astype(np.int32))
    # the device runtime layouts carry ONLY their gather index
    assert bg.by_dst.dst is None and bg.by_src.src is None
    # src-blocked layout: sorted by src
    bs = _build_one_np(
        src.astype(np.int64), src.astype(np.int64), dst.astype(np.int64),
        et.astype(np.int64), bg.num_nodes, td, te,
    )
    assert (np.diff(bs["src"]) >= 0).all()
    np.testing.assert_array_equal(bs["dst"], np.asarray(bg.by_src.dst))


def test_pallas_forward_matches_xla():
    src, dst, et, bg, h, attn, bias, n = _random_case()
    # The default case must keep multi-chunk dst blocks, or the kernel's
    # is_last-gated store/merge path silently loses test coverage.
    assert bg.by_dst.num_chunks > bg.by_dst.num_blocks
    want = relgat_propagate(
        h, attn, bias, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
        num_nodes=n,
    )
    got = relgat_propagate_pallas(h, attn, bias, bg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_pallas_forward_no_bias_and_empty_blocks():
    # All edges into the first 32 nodes -> most blocks empty (exercises the
    # block_nonempty zeroing).
    rng = np.random.default_rng(3)
    n, e = 200, 400
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, 32, e).astype(np.int32)
    et = rng.integers(0, 5, e).astype(np.int32)
    bg = build_blocked_graph(src, dst, et, n, block_nodes=16, chunk_edges=32)
    h = jnp.asarray(rng.standard_normal((n, 2, 8)).astype(np.float32))
    attn = jnp.asarray((rng.standard_normal((2, 5, 8)) * 0.3).astype(np.float32))
    want = relgat_propagate(
        h, attn, None, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
        num_nodes=n,
    )
    got = relgat_propagate_pallas(h, attn, None, bg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got)[32:], 0.0)


def test_pallas_gradients_match_xla():
    src, dst, et, bg, h, attn, bias, n = _random_case(seed=5)

    def loss_pallas(h_, a_, b_):
        out = relgat_propagate_pallas(h_, a_, b_, bg)
        return jnp.sum(jnp.sin(out))

    def loss_xla(h_, a_, b_):
        out = relgat_propagate(
            h_, a_, b_, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
            num_nodes=n,
        )
        return jnp.sum(jnp.sin(out))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(h, attn, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(h, attn, bias)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_pallas_grad_under_jit_with_traced_graph():
    """The custom VJP must compose with jit when the blocked layout arrives
    as a traced argument (the train step passes the graph as an input)."""
    src, dst, et, bg, h, attn, bias, n = _random_case(seed=11)

    @jax.jit
    def loss(h_, a_, b_, bg_):
        return jnp.sum(jnp.sin(relgat_propagate_pallas(h_, a_, b_, bg_)))

    gp = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(h, attn, bias, bg)

    def loss_xla(h_, a_, b_):
        out = relgat_propagate(
            h_, a_, b_, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
            num_nodes=n,
        )
        return jnp.sum(jnp.sin(out))

    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(h, attn, bias)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_train_step_with_pallas_matches_xla_step():
    """Full jitted train step with use_pallas == baseline step numerics."""
    from relgat_projector_tpu.config import TrainConfig
    from relgat_projector_tpu.data.graph import build_graph as _bg
    from relgat_projector_tpu.schedules import make_lr_schedule
    from relgat_projector_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from relgat_projector_tpu.train.step import make_train_step

    rng = np.random.default_rng(13)
    n, e, r, d = 100, 500, 4, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    et = rng.integers(0, r, e)
    emb = rng.standard_normal((n, d)).astype(np.float32)

    cfg = ModelConfig(
        in_dim=d, num_rel=r, gat_out_dim=8, gat_heads=2, gat_num_layers=2,
        dropout=0.0, project_to_input_size=True, projection_layers=2,
    )
    cfg_p = ModelConfig(**{**cfg.to_dict(), "use_pallas": True})
    tc = TrainConfig(
        train_batch_size=32, num_neg=3, lr=1e-3, lr_scheduler="constant",
        warmup_steps=0, eval_ks_ranks=(1, 2), use_self_adv_neg=True,
    )
    sched = make_lr_schedule(tc.lr, "constant", 100, 0)
    opt = make_optimizer(tc, sched)

    batch = (
        jnp.asarray(rng.integers(0, n, 32), jnp.int32),
        jnp.asarray(rng.integers(0, r, 32), jnp.int32),
        jnp.asarray(rng.integers(0, n, 32), jnp.int32),
        jnp.ones((32,), jnp.float32),
    )

    results = {}
    for name, c, blocked in (("xla", cfg, False), ("pallas", cfg_p, True)):
        g = _bg(src, dst, et, num_nodes=n, blocked=blocked, block_nodes=16,
                chunk_edges=64)
        x = jnp.asarray(pad_node_embeddings(emb, g.num_nodes))
        params = init_model(jax.random.PRNGKey(0), c)
        state = create_train_state(params, opt, jax.random.PRNGKey(1))
        step = make_train_step(c, tc, opt, sched)
        state, m = step(state, x, g, *batch)
        results[name] = (jax.device_get(state.params), float(m["loss"]))

    np.testing.assert_allclose(
        results["xla"][1], results["pallas"][1], rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(results["xla"][0]),
        jax.tree_util.tree_leaves(results["pallas"][0]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_model_with_use_pallas_matches_baseline():
    rng = np.random.default_rng(7)
    n, e, r, d = 120, 600, 5, 24
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    et = rng.integers(0, r, e)

    g_plain = build_graph(src, dst, et, num_nodes=n)
    g_blocked = build_graph(
        src, dst, et, num_nodes=n, blocked=True, block_nodes=16,
        chunk_edges=64,
    )
    emb = rng.standard_normal((n, d)).astype(np.float32)
    x_plain = jnp.asarray(pad_node_embeddings(emb, g_plain.num_nodes))
    x_blocked = jnp.asarray(pad_node_embeddings(emb, g_blocked.num_nodes))

    cfg = ModelConfig(
        in_dim=d, num_rel=r, gat_out_dim=8, gat_heads=2, gat_num_layers=2,
        dropout=0.0, project_to_input_size=True, projection_layers=2,
    )
    params = init_model(jax.random.PRNGKey(0), cfg)
    want = single_gat_step(params, cfg, x_plain, g_plain)

    cfg_p = ModelConfig(**{**cfg.to_dict(), "use_pallas": True})
    got = single_gat_step(params, cfg_p, x_blocked, g_blocked)
    np.testing.assert_allclose(
        np.asarray(got)[:n], np.asarray(want)[:n], rtol=1e-4, atol=1e-5
    )


def test_pallas_attention_dropout_replay_matches_xla():
    """In-kernel attention dropout: the forward kernel's hash-based mask
    (ops/dropout.py) must match the XLA path bitwise for the same key, and
    the hand-written backward must REPLAY it (round-1 fell back to the XLA
    path whenever rel_attn_dropout > 0 — VERDICT item 4)."""
    from relgat_projector_tpu.ops.pallas.kernels import relgat_propagate_pallas

    rng = np.random.default_rng(0)
    n, e, r, heads, f = 200, 1500, 5, 3, 16
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = rng.integers(0, r, e).astype(np.int32)
    g = build_graph(src, dst, et, n, blocked=True, block_nodes=64,
                    chunk_edges=128)
    n_pad = g.num_nodes
    h = jnp.asarray(rng.standard_normal((n_pad, heads, f)).astype(np.float32))
    attn = jnp.asarray(
        (rng.standard_normal((heads, r, f)) * 0.3).astype(np.float32)
    )
    bias = jnp.asarray((rng.standard_normal(r) * 0.1).astype(np.float32))
    key = jax.random.PRNGKey(42)
    rate = 0.3

    from relgat_projector_tpu.ops.relgat_ops import relgat_propagate

    want = relgat_propagate(
        h, attn, bias, g.src, g.dst, g.etype, num_nodes=n_pad,
        attn_dropout_rate=rate, dropout_rng=key, edges_sorted_by_dst=True,
    )
    got = relgat_propagate_pallas(
        h, attn, bias, g.blocked, attn_dropout_rate=rate, dropout_rng=key
    )
    # Real rows only: the XLA path aggregates the padded tail edges into the
    # absorber pad-node row; the blocked layout excludes them by mask.
    np.testing.assert_allclose(
        np.asarray(got)[:n], np.asarray(want)[:n], rtol=1e-5, atol=1e-6
    )
    # Dropout actually drops (differs from the no-dropout output).
    base = relgat_propagate_pallas(h, attn, bias, g.blocked)
    assert np.abs(np.asarray(base) - np.asarray(got)).max() > 1e-3

    def loss_p(h_, a_, b_):
        return jnp.sum(jnp.sin(relgat_propagate_pallas(
            h_, a_, b_, g.blocked, attn_dropout_rate=rate, dropout_rng=key
        )[:n]))

    def loss_x(h_, a_, b_):
        return jnp.sum(jnp.sin(relgat_propagate(
            h_, a_, b_, g.src, g.dst, g.etype, num_nodes=n_pad,
            attn_dropout_rate=rate, dropout_rng=key,
            edges_sorted_by_dst=True,
        )[:n]))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(h, attn, bias)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(h, attn, bias)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_default_precision_bf16_packed_stream_pairs():
    """In "default" mode the backward's packed g/stats stream rides bf16
    with softmax stats as (hi, lo) pairs (VERDICT r2 next-8 memory lever:
    halves the largest node-sized backward array). The pair recombination
    must carry fp32-grade stats: grads stay inside the bf16-stream envelope
    WITH dropout active (the stats feed the cancellation-prone
    de = alpha * (dalpha - S))."""
    from relgat_projector_tpu.ops.pallas.kernels import _packed_stream

    rng = np.random.default_rng(11)
    # Unit check: pair encoding reconstructs ~16-mantissa-bit stats.
    x = (rng.standard_normal((64, 4)) * 50).astype(np.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    rec = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
    rel = np.abs(rec - x) / np.maximum(np.abs(x), 1e-9)
    assert rel.max() < 2e-5, rel.max()

    n, e, r, heads, f = 400, 3000, 5, 4, 16
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = rng.integers(0, r, e).astype(np.int32)
    g = build_graph(src, dst, et, n, blocked=True, block_nodes=64,
                    chunk_edges=128)
    h = jnp.asarray(
        rng.standard_normal((g.num_nodes, heads, f)).astype(np.float32)
    )
    attn = jnp.asarray(
        (rng.standard_normal((heads, r, f)) * 0.3).astype(np.float32)
    )
    bias = jnp.asarray((rng.standard_normal(r) * 0.1).astype(np.float32))
    kw = dict(attn_dropout_rate=0.3, dropout_rng=jax.random.PRNGKey(3))

    def loss_p(h_, a_, b_):
        return jnp.sum(jnp.sin(relgat_propagate_pallas(
            h_, a_, b_, g.blocked, kernel_precision="default", **kw)[:n]))

    def loss_oracle(h_, a_, b_):
        hr = h_.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.sum(jnp.sin(relgat_propagate(
            hr, a_, b_, g.src, g.dst, g.etype, num_nodes=g.num_nodes,
            edges_sorted_by_dst=True, **kw)[:n]))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(h, attn, bias)
    gx = jax.grad(loss_oracle, argnums=(0, 1, 2))(h, attn, bias)
    for name, a, b in zip(("dh", "dattn", "dbias"), gp, gx):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-9)
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
        assert err < 6e-3, (name, err)


def test_default_precision_bf16_streams_match_rounded_oracle():
    """``kernel_precision="default"`` rides bf16 source-feature streams
    (``ops/pallas/kernels._stream_dtype``). Against an fp32 XLA oracle fed
    the SAME bf16-rounded inputs the mode must stay tight — that isolates
    the stream cast (the only intended delta on CPU, where interpret-mode
    dots run fp32 regardless of precision) from inherent input-rounding
    sensitivity."""
    rng = np.random.default_rng(3)
    n, e, r, heads, f = 500, 4000, 6, 4, 16
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = rng.integers(0, r, e).astype(np.int32)
    g = build_graph(src, dst, et, n, blocked=True, block_nodes=64,
                    chunk_edges=128)
    h = jnp.asarray(
        rng.standard_normal((g.num_nodes, heads, f)).astype(np.float32)
    )
    attn = jnp.asarray(
        (rng.standard_normal((heads, r, f)) * 0.3).astype(np.float32)
    )
    bias = jnp.asarray((rng.standard_normal(r) * 0.1).astype(np.float32))

    def loss_p(h_, a_, b_):
        return jnp.sum(jnp.sin(relgat_propagate_pallas(
            h_, a_, b_, g.blocked, kernel_precision="default")[:n]))

    def loss_oracle(h_, a_, b_):
        hr = h_.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.sum(jnp.sin(relgat_propagate(
            hr, a_, b_, g.src, g.dst, g.etype, num_nodes=g.num_nodes,
            edges_sorted_by_dst=True)[:n]))

    got = relgat_propagate_pallas(
        h, attn, bias, g.blocked, kernel_precision="default"
    )
    hr = h.astype(jnp.bfloat16).astype(jnp.float32)
    want = relgat_propagate(
        hr, attn, bias, g.src, g.dst, g.etype, num_nodes=g.num_nodes,
        edges_sorted_by_dst=True,
    )
    np.testing.assert_allclose(
        np.asarray(got)[:n], np.asarray(want)[:n], rtol=2e-3, atol=1e-4
    )
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(h, attn, bias)
    gx = jax.grad(loss_oracle, argnums=(0, 1, 2))(h, attn, bias)
    for name, a, b in zip(("dh", "dattn", "dbias"), gp, gx):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-9)
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
        assert err < 5e-3, (name, err)
