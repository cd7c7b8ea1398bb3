"""The driver-facing bench.py contract (VERDICT r4 #2/#7): one JSON line
carrying BOTH precision modes, the layout each ran at, and the
--probe-pick guard that times the tuner's choice against the last
committed known-good layout. These run against a stubbed bench_jax — the
JSON/flag plumbing is what regressed in r4 (dead-code tuner gate), so it
gets its own fast regression surface."""

import io
import json
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench as B

    calls = []

    def fake_bench_jax(cfg_d, steps=30, warmup=3, use_pallas=False,
                       kernel_precision="highest", td=128, te=256,
                       steps_per_call=1, graph_class="uniform"):
        calls.append((kernel_precision, td, te, graph_class))
        v = {"highest": 2.0e7, "default": 3.9e7}[kernel_precision]
        if (td, te) == (128, 512):
            v = 1.62e7
        lay = (
            td or 128,
            te or {"highest": 256, "default": 1536}[kernel_precision],
        )
        return v, 0.1, [1.0, 1.01, 1.02], lay

    monkeypatch.setattr(B, "bench_jax", fake_bench_jax)
    monkeypatch.setattr(B, "_wait_for_backend", lambda *a, **k: None)
    B._test_calls = calls
    return B


def _run(B, argv):
    B._test_calls.clear()
    old = sys.argv
    sys.argv = ["bench.py", "--no-wait"] + argv
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            B.main()
    finally:
        sys.argv = old
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def test_plain_invocation_reports_both_modes(bench):
    o = _run(bench, [])
    assert o["value"] == 20000000 and o["value_bf16"] == 39000000
    assert o["layout"] == "128x256" and o["layout_bf16"] == "128x1536"
    assert "vs_baseline" in o and "vs_baseline_bf16" in o
    assert "window_spread_pct" in o and "window_spread_pct_bf16" in o
    # fp32-parity FIRST: "value" has been fp32 every round (driver
    # continuity) — the bf16 mode must never displace it.
    modes = [c[0] for c in bench._test_calls]
    assert modes == ["highest", "default"]


def test_explicit_mode_keeps_historical_shape(bench):
    o = _run(bench, ["--kernel-precision", "highest",
                     "--td", "128", "--te", "384"])
    assert o["value"] == 20000000 and o["layout"] == "128x384"
    assert "value_bf16" not in o


def test_partial_td_te_only_fills_unspecified(bench):
    """ADVICE r4 #1: --td 128 with --te 0 must keep the user's td. The
    fill-in happens inside bench_jax (tuner gate); here we assert the CLI
    passes the partial values through untouched."""
    _run(bench, ["--kernel-precision", "highest", "--td", "64"])
    assert bench._test_calls == [("highest", 64, 0, "uniform")]


def test_probe_pick_skips_when_pick_is_known_good(bench):
    o = _run(bench, ["--probe-pick"])
    assert "probe_prior" not in o and "probe_prior_bf16" not in o
    assert len(bench._test_calls) == 2  # no extra timing runs


def test_probe_pick_times_prior_when_diverging(bench, monkeypatch):
    monkeypatch.setattr(
        bench, "KNOWN_GOOD_LAYOUT",
        {"highest": (128, 512), "default": (128, 1536)},
    )
    o = _run(bench, ["--probe-pick", "--kernel-precision", "highest"])
    assert o["probe_prior"]["layout"] == "128x512"
    assert o["probe_prior"]["value"] == 16200000
    assert o["probe_prior"]["pick_vs_prior_pct"] == pytest.approx(23.5)


def test_no_pallas_single_mode(bench):
    o = _run(bench, ["--no-pallas"])
    assert "value_bf16" not in o


def test_known_good_layout_matches_tuner_pick_on_bench_graph():
    """KNOWN_GOOD_LAYOUT is the --probe-pick guard's reference point; it
    must track the tuner's actual pick on the driver's bench graph. If an
    anchor-table change moves the pick, this fails until KNOWN_GOOD is
    updated WITH a fresh measured probe (the r4 failure mode was exactly
    an un-probed pick change)."""
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench as B

    from relgat_projector_tpu.data.layout_tuner import pick_layout

    n, src, dst, *_ = B._make_inputs(B.BENCH, graph_class="uniform")
    for mode, want in B.KNOWN_GOOD_LAYOUT.items():
        ch = pick_layout(
            src, dst, n, kernel_precision=mode,
            heads_features=B.BENCH["gat_heads"] * B.BENCH["gat_out_dim"],
            num_rel=B.BENCH["num_rel"],
        )
        assert (ch.block_nodes, ch.chunk_edges) == want, (mode, ch, want)


def test_graph_classes_generate_distinct_structures():
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench as B

    cfg = dict(num_nodes=2000, num_edges=20000, num_rel=4, emb_dim=8,
               batch_size=16, num_neg=2)
    feats = {}
    for gc in ("uniform", "zipf", "clustered", "dense"):
        n, src, dst, *_ = B._make_inputs(cfg, graph_class=gc)
        assert src.shape == dst.shape == (20000,)
        assert dst.max() < n
        deg = np.bincount(dst, minlength=n)
        feats[gc] = (n, float(deg.std() / deg.mean()))
    assert feats["dense"][0] == 500  # degree-40 class
    assert feats["zipf"][1] > 3 * feats["uniform"][1]  # heavy tail
    # clustered: same degree marginals as uniform but high block locality
    n, src, dst, *_ = B._make_inputs(cfg, graph_class="clustered")
    # Intra-cluster edges share a 500-node cluster spanning ~8 TD=64
    # blocks, so same-block probability is ~0.9/8 ~= 0.11 vs uniform's
    # ~64/2000 = 0.032.
    loc = float(np.mean((src // 64) == (dst // 64)))
    assert loc > 0.08
