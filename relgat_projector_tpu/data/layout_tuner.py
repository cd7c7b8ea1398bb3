"""Blocked-layout auto-tuning from the graph's degree distribution.

The Pallas kernels walk block-padded edge layouts (``data/blocked.py``):
dst-sorted edges padded per TD-row destination block to a multiple of the
chunk size TE (forward), plus the src-blocked mirror (backward). The
optimal (TD, TE) is degree-distribution-specific — the measured bf16
optimum on the uniform avg-degree-10 bench graph (TD=64/TE=768,
BENCH_NOTES.md r3 TD/TE sweeps) "pays padding on denser graphs" — so
hardcoded per-mode constants silently train real KGs below their optimum
(VERDICT r3 missing #2).

This module replaces the constants with a fitted cost model evaluated on
the ACTUAL graph at layout-build time:

    step_ms = K + A*C + B*S + G*TD*S + H*TE*S

where, summed over the layers' forward (dst-blocked) and backward
(src-blocked) kernel walks,
    C = number of chunks      (per-chunk grid/DMA issue skeleton),
    S = C*TE = padded slots   (per-edge-slot streaming + compute),
and the TD*S / TE*S terms capture the one-hot matmul's [TD, TE] growth
and per-mode tile-size preferences (fp32's 6-pass matmuls want large M:
its fitted G is negative, i.e. shrinking TD *costs* time — matching the
measured TD=64 fp32 regression).

Calibration: least squares on the round-2/3 on-chip sweeps (BENCH_NOTES
"Default-mode chunk-size sweep", "TD sweep in bf16 mode", fp32 TE
re-measurements), with K pinned to the knockout-attribution non-kernel
step time and A (the precision-independent grid skeleton) shared across
modes. The fit reproduces every measured point within +-2% and both
measured optima (fp32 TD=128/TE=256, bf16 TD=64/TE=768 on the uniform
bench graph). TE=1024/2048 are excluded from the candidate set — measured
Mosaic scheduling troughs (27.5M vs 34.4M msg/s at neighbours, repro'd).

Scanned layouts (scan_segments > 1) keep TD=128/TE=256: per-SEGMENT chunk
padding re-inflates with TE (measured 16M-edge/16-segment: 2412 ms at
TE=768 vs 2314 ms at TE=256 — BENCH_NOTES r3).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

# Candidate grid. TE values must keep the (8, 128)-divisible BlockSpec
# contract (data/blocked.py); 1024/2048 excluded (Mosaic troughs). 128 is
# slower at bench-class H*F (per-chunk grid overhead) but becomes the only
# fit at production tiles (H*F >= ~2048) where bigger chunks blow VMEM.
CANDIDATE_TE: Tuple[int, ...] = (128, 256, 384, 512, 768, 1536)

# Fitted constants (see module docstring; units: ms per step with C in
# 1e6 chunks, S in 1e6 slots, TD*S in 1e9, TE*S in 1e9).
_CAL: Dict[str, Dict[str, object]] = {
    # bf16 1-pass MXU kernels ("default"): grid skeleton is ~50-66% of
    # kernel time, so fewer/bigger chunks win until padding dominates.
    "default": dict(
        K=22.1, A=708.19, B=5.6453, G=8.5454, H=0.0, tds=(64, 128)
    ),
    # fp32-exact tiers ("highest"): per-slot MXU work dominates; negative
    # G = MXU M-dim efficiency loss at small TD, so TD stays at 128
    # (TD=256 unmeasured on this tier — not extrapolated into).
    "highest": dict(
        K=15.7, A=708.19, B=23.0439, G=-54.7864, H=4.8927, tds=(128,)
    ),
}

SCANNED_LAYOUT: Tuple[int, int] = (128, 256)


@dataclasses.dataclass(frozen=True)
class LayoutChoice:
    block_nodes: int           # TD
    chunk_edges: int           # TE
    predicted_ms: float        # modeled kernel+fixed step time
    reason: str                # "auto" | "scanned" | "explicit"
    table: Tuple[Tuple[int, int, float], ...] = ()  # (TD, TE, ms) grid


def _chunks_slots(
    keys: np.ndarray, num_nodes: int, td: int, te: int
) -> Tuple[int, int]:
    """Exact chunk/slot counts for one blocked layout: per TD-block edge
    counts from the degree histogram, each padded up to a TE multiple."""
    num_blocks = max(1, -(-num_nodes // td))
    counts = np.bincount(keys // td, minlength=num_blocks)
    c = int(-(-counts // te).sum())  # sum of ceil(e_b / te); empty -> 0
    return c, c * te


def predict_step_ms(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    td: int,
    te: int,
    mode: str,
    num_layers: int = 2,
) -> float:
    """Modeled per-step cost (ms). Only RELATIVE values across (td, te)
    matter for tuning; absolute numbers assume the bench-class step."""
    cal = _CAL["default" if mode == "default" else "highest"]
    cd, sd = _chunks_slots(np.asarray(dst), num_nodes, td, te)
    cs, ss = _chunks_slots(np.asarray(src), num_nodes, td, te)
    # Per layer: forward walks the dst-blocked layout once, backward the
    # src-blocked one once.
    c = num_layers * (cd + cs)
    s = num_layers * (sd + ss)
    return float(
        cal["K"]
        + cal["A"] * (c * 1e-6)
        + cal["B"] * (s * 1e-6)
        + cal["G"] * (td * s * 1e-9)
        + cal["H"] * (te * s * 1e-9)
    )


# Mosaic's scoped-VMEM stack limit on v5e, and the empirical per-mode
# envelope over BOTH kernels' grid-step working sets. The backward
# dominates: it keeps ~4-5 live fp32 [TE, H*F] temporaries (ps/g/rel_att/
# contrib/deps recomputes) on top of the double-buffered streams.
# Calibrated against the compiler's measured scoped allocations
# (reval_r4 kernel-check OOMs + passes):
#   fwd  fp32 TD=128/TE=256/HF=3200 -> 18.41M   (5.6 x TE*HF*4)
#   fwd  bf16 TD=64 /TE=768/HF=3200 -> 22.61M   (2.3 x)
#   bwd  bf16 TD=64 /TE=768/HF=2048 -> 30.88M   (4.9 x)
#   both fp32 TD=128/TE=256/HF=2048 -> compiles (<= 7.6 x)
# Envelope slopes 6.0 (fp32) / 5.0 (bf16, streams half-width) bound every
# observation.
_VMEM_LIMIT_BYTES = 16 * 1024 * 1024
_VMEM_SLOPE = {"highest": 6.0, "default": 5.0}


def estimate_kernel_vmem(
    td: int, te: int, heads_features: int, num_rel: int, mode: str
) -> int:
    """Conservative scoped-VMEM envelope (bytes) for one grid step of the
    fused kernel pair (max over fwd and the hungrier bwd): the slope term
    covers the [TE, H*F]-shaped streams + live fp32 temporaries; plus the
    [TD, H*F] out/dh blocks and the resident relation banks."""
    mode = "default" if mode == "default" else "highest"
    hf = heads_features
    comp = (
        _VMEM_SLOPE[mode] * te * hf * 4
        + 2 * td * hf * 4       # out / dh block, double-buffered
        + 2 * num_rel * hf * 4  # attn bank + dattn accumulator
        + num_rel * 128 * 8     # bias banks
        + td * te * 4           # one-hot tile
    )
    return int(comp)


def pick_layout(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    kernel_precision: str = "highest",
    scanned: bool = False,
    num_layers: int = 2,
    candidate_te: Sequence[int] = CANDIDATE_TE,
    heads_features: Optional[int] = None,
    num_rel: int = 8,
) -> LayoutChoice:
    """Choose (block_nodes, chunk_edges) for this graph + kernel mode.

    With ``heads_features`` (= gat_heads * per-head out dim) given,
    candidates whose kernel working set exceeds the scoped-VMEM limit are
    dropped BEFORE cost ranking — at production tiles (H*F >= ~2048,
    reference doc-scale 16 heads x 200 = 3200) the bench-class layouts
    fail to compile at all (Mosaic scoped-vmem OOM, reval_r4 kernel
    check), so VMEM feasibility dominates speed."""
    mode = "default" if kernel_precision == "default" else "highest"

    def fits(td, te):
        if heads_features is None:
            return True
        return (
            estimate_kernel_vmem(td, te, heads_features, num_rel, mode)
            <= _VMEM_LIMIT_BYTES
        )

    if scanned:
        td, te = SCANNED_LAYOUT
        while te > 128 and not fits(td, te):
            te //= 2
        return LayoutChoice(
            td, te,
            predict_step_ms(src, dst, num_nodes, td, te, kernel_precision,
                            num_layers),
            reason="scanned",
        )
    table = []
    for td in _CAL[mode]["tds"]:
        for te in candidate_te:
            if not fits(td, te):
                continue
            table.append(
                (td, te,
                 predict_step_ms(src, dst, num_nodes, td, te, mode,
                                 num_layers))
            )
    if not table:
        # Nothing in the grid fits (enormous H*F): smallest legal layout.
        td, te = min(_CAL[mode]["tds"]), 128
        return LayoutChoice(
            td, te,
            predict_step_ms(src, dst, num_nodes, td, te, mode, num_layers),
            reason="vmem-floor",
        )
    td, te, ms = min(table, key=lambda r: r[2])
    return LayoutChoice(td, te, ms, reason="auto", table=tuple(table))
