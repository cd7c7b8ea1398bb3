"""Blocked-layout auto-tuning (data/layout_tuner.py): the cost model's
chunk/slot accounting matches the real layout builder exactly, the picks
reproduce the on-chip sweep optima (BENCH_NOTES r2/r3), and the choice is
threaded through dataset/config/trainer (VERDICT r3 missing #2)."""

import numpy as np

from relgat_projector_tpu.data.layout_tuner import (
    CANDIDATE_TE,
    SCANNED_LAYOUT,
    _chunks_slots,
    pick_layout,
    predict_step_ms,
)


def _graph(n, e, seed=0, zipf=None):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int64)
    if zipf is None:
        dst = rng.integers(0, n, e).astype(np.int64)
    else:
        # Heavy-tailed dst degrees: Zipf-ranked popularity over node ids.
        p = 1.0 / np.arange(1, n + 1) ** zipf
        p /= p.sum()
        dst = rng.choice(n, size=e, p=p).astype(np.int64)
    return src, dst


def test_chunk_slot_accounting_matches_real_builder():
    """The model's C must equal the chunks the builder actually creates."""
    from relgat_projector_tpu.data.graph import build_graph

    src, dst = _graph(700, 4000, seed=3)
    et = np.zeros(4000, np.int64)
    for td, te in ((64, 128), (128, 256), (64, 384)):
        g = build_graph(
            src, dst, et, num_nodes=700, blocked=True,
            block_nodes=td, chunk_edges=te,
        )
        c_dst, s_dst = _chunks_slots(dst, 700, td, te)
        assert g.blocked.by_dst.num_chunks == c_dst
        assert g.blocked.by_dst.num_slots == s_dst
        c_src, _ = _chunks_slots(src, 700, td, te)
        assert g.blocked.by_src.num_chunks == c_src


def test_picks_reproduce_measured_optima_on_uniform_graph():
    """On the bench-class uniform avg-degree-10 graph the tuner must land
    on the sweep-measured optima: fp32 TD=128/TE=256, bf16 TD=64/TE=768."""
    src, dst = _graph(100_000, 1_000_000)
    hi = pick_layout(src, dst, 100_000, kernel_precision="highest")
    assert (hi.block_nodes, hi.chunk_edges) == (128, 256), hi
    lo = pick_layout(src, dst, 100_000, kernel_precision="default")
    assert (lo.block_nodes, lo.chunk_edges) == (64, 768), lo
    # The choice carries the full candidate table for logging/inspection.
    assert len(lo.table) == 2 * len(CANDIDATE_TE)
    assert lo.predicted_ms == min(r[2] for r in lo.table)


def test_scanned_layouts_stay_fixed():
    src, dst = _graph(10_000, 100_000)
    ch = pick_layout(src, dst, 10_000, kernel_precision="default",
                     scanned=True)
    assert (ch.block_nodes, ch.chunk_edges) == SCANNED_LAYOUT
    assert ch.reason == "scanned"


def test_degree_distribution_moves_the_pick():
    """Denser/heavier-tailed graphs shift padding economics: the model
    must react to the measured degree distribution, not return a global
    constant. On a dense (avg-degree 40) graph, TD=64 blocks hold ~2560
    edges, so bf16's padding share at TE=768 drops and bigger chunks get
    cheaper relative to uniform-deg-10."""
    n = 25_000
    src_d, dst_d = _graph(n, 1_000_000)     # avg degree 40
    src_u, dst_u = _graph(100_000, 1_000_000)  # avg degree 10
    # At avg-degree 40 bigger chunks win (TD=64 blocks hold ~2560 edges):
    # the pick must move to TE >= 512 while keeping padding bounded.
    lo_d = pick_layout(src_d, dst_d, n, kernel_precision="default")
    assert lo_d.chunk_edges >= 512, lo_d
    c, s = _chunks_slots(dst_d, n, lo_d.block_nodes, lo_d.chunk_edges)
    pad_frac = 1 - 1_000_000 / s
    assert pad_frac < 0.20, (lo_d, pad_frac)
    # Heavy-tailed: a zipf-1.0 dst distribution concentrates degrees into
    # few blocks; the tuner must still pick from the safe candidate set
    # and its cost prediction must rank the pick at the table minimum.
    src_z, dst_z = _graph(100_000, 1_000_000, zipf=1.0)
    lo_z = pick_layout(src_z, dst_z, 100_000, kernel_precision="default")
    assert lo_z.chunk_edges in CANDIDATE_TE
    assert lo_z.predicted_ms == min(r[2] for r in lo_z.table)
    # Model sanity across graphs: at the same layout, the zipf graph has
    # strictly more padded slots than uniform (tail blocks pad heavily).
    _, s_u = _chunks_slots(dst_u, 100_000, 64, 768)
    _, s_z = _chunks_slots(dst_z, 100_000, 64, 768)
    assert s_z > s_u


def test_dataset_auto_tunes_and_threads_choice():
    from relgat_projector_tpu.data.dataset import RelGATData
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=300, num_edges=3000, num_rel=4, emb_dim=8, seed=0
    )
    data = RelGATData(
        node2emb, rel2idx, triplets, seed=1, blocked=True,
        chunk_edges=None, block_nodes=None, kernel_precision="default",
    )
    ch = data.layout_choice
    assert ch is not None and ch.reason == "auto"
    assert data.graph.blocked.by_dst.chunk_edges == ch.chunk_edges
    assert data.graph.blocked.by_dst.block_nodes == ch.block_nodes
    # Explicit values bypass the tuner entirely.
    data2 = RelGATData(
        node2emb, rel2idx, triplets, seed=1, blocked=True,
        chunk_edges=128, block_nodes=64,
    )
    assert data2.layout_choice is None
    assert data2.graph.blocked.by_dst.chunk_edges == 128


def test_trainer_config_zero_means_auto():
    from relgat_projector_tpu.config import (
        MeshConfig, ModelConfig, RunConfig, TrainConfig,
    )
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=200, num_edges=1600, num_rel=4, emb_dim=8, seed=0
    )

    def build(**model_kw):
        run = RunConfig(
            model=ModelConfig(
                in_dim=8, num_rel=4, gat_out_dim=8, gat_heads=2,
                gat_num_layers=1, dropout=0.0, use_pallas=True,
                **model_kw,
            ),
            train=TrainConfig(
                epochs=1, train_batch_size=32, eval_batch_size=32,
                num_neg=2, lr=1e-3, lr_scheduler="constant",
                warmup_steps=0, eval_ks_ranks=(1,), seed=3,
                log_every_n_steps=10_000,
                out_dir="/tmp/relgat-layout-tuner-test",
            ),
            mesh=MeshConfig(),
        )
        return RelGATTrainer(
            run, node2emb, rel2idx, triplets, log_to_console=False
        )

    t = build()  # block_nodes=0 / chunk_edges=0 -> auto
    assert t.dataset.layout_choice is not None
    t2 = build(block_nodes=64, chunk_edges=128)
    assert t2.dataset.layout_choice is None
    assert t2.dataset.graph.blocked.by_dst.chunk_edges == 128


def test_vmem_filter_rejects_oom_layouts_at_production_tiles():
    """At the reference's doc-scale tile (16 heads x 200 = H*F 3200) the
    bench-class layouts fail Mosaic scoped-VMEM compilation (measured
    18.41M / 22.61M vs the 16M limit — reval_r4 kernel check); the tuner
    must refuse them and still return a feasible layout."""
    from relgat_projector_tpu.data.layout_tuner import (
        _VMEM_LIMIT_BYTES, estimate_kernel_vmem,
    )

    # The three on-chip-measured OOM points must estimate as over-limit
    # (fwd fp32 18.41M, fwd bf16 22.61M, bwd bf16 30.88M at H*F=2048).
    assert estimate_kernel_vmem(128, 256, 3200, 45, "highest") > _VMEM_LIMIT_BYTES
    assert estimate_kernel_vmem(64, 768, 3200, 45, "default") > _VMEM_LIMIT_BYTES
    assert estimate_kernel_vmem(64, 768, 2048, 45, "default") > _VMEM_LIMIT_BYTES
    # The on-chip-PASSING config (fp32 fwd+bwd at H*F=2048, TD=128/TE=256)
    # must stay feasible, and the bench tile comfortably under.
    assert estimate_kernel_vmem(128, 256, 2048, 45, "highest") <= _VMEM_LIMIT_BYTES
    assert estimate_kernel_vmem(64, 768, 256, 8, "default") < _VMEM_LIMIT_BYTES / 3

    src, dst = _graph(20_000, 200_000)
    for mode in ("highest", "default"):
        ch = pick_layout(src, dst, 20_000, kernel_precision=mode,
                         heads_features=3200, num_rel=45)
        assert estimate_kernel_vmem(
            ch.block_nodes, ch.chunk_edges, 3200, 45, mode
        ) <= _VMEM_LIMIT_BYTES, ch
        # Every surviving table row is feasible too.
        for td, te, _ in ch.table:
            assert estimate_kernel_vmem(td, te, 3200, 45, mode) <= _VMEM_LIMIT_BYTES
    # Small tiles are unaffected: same pick with or without the filter.
    src_u, dst_u = _graph(100_000, 1_000_000)
    a = pick_layout(src_u, dst_u, 100_000, kernel_precision="default")
    b = pick_layout(src_u, dst_u, 100_000, kernel_precision="default",
                    heads_features=256, num_rel=8)
    assert (a.block_nodes, a.chunk_edges) == (b.block_nodes, b.chunk_edges)


def test_predict_step_ms_matches_fit_points():
    """Calibration regression guard: the model must keep reproducing the
    on-chip sweep measurements it was fitted to (BENCH_NOTES r3) within
    2.5% — refitting constants without re-checking breaks the tuner."""
    rng = np.random.default_rng(0)
    n, e = 100_000, 1_000_000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    meas = {
        ("default", 128, 256): 2e6 / 31.62e6 * 1e3,
        ("default", 128, 768): 2e6 / 34.44e6 * 1e3,
        ("default", 64, 768): 2e6 / 35.38e6 * 1e3,
        ("default", 256, 768): 2e6 / 31.12e6 * 1e3,
        ("highest", 128, 256): 2e6 / 18.94e6 * 1e3,
        ("highest", 128, 768): 2e6 / 17.29e6 * 1e3,
        ("highest", 64, 256): 2e6 / 15.53e6 * 1e3,
    }
    for (mode, td, te), want in meas.items():
        got = predict_step_ms(src, dst, n, td, te, mode)
        assert abs(got - want) / want < 0.025, (mode, td, te, got, want)
