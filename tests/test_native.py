"""Native C++ graph builder vs the NumPy reference implementation."""

import os

import numpy as np
import pytest

from relgat_projector_tpu.data import blocked as blocked_mod
from relgat_projector_tpu.data.native import load_native


def _build(src, dst, et, n, td, te):
    """Both layout families at the host-dict level (where the native C++
    builder plugs in and every array still exists; the device dataclass
    ships only the runtime subset)."""
    s64, d64, e64 = (
        src.astype(np.int64), dst.astype(np.int64), et.astype(np.int64)
    )
    return {
        "by_dst": blocked_mod._build_one_np(d64, s64, d64, e64, n, td, te),
        "by_src": blocked_mod._build_one_np(s64, s64, d64, e64, n, td, te),
    }


@pytest.mark.skipif(load_native() is None, reason="no native toolchain")
def test_native_matches_numpy_blocked_layout(monkeypatch):
    rng = np.random.default_rng(0)
    n, e = 500, 4000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = rng.integers(0, 9, e).astype(np.int32)

    native = _build(src, dst, et, n, td=32, te=128)

    monkeypatch.setenv("RELGAT_NO_NATIVE", "1")
    numpy_ = _build(src, dst, et, n, td=32, te=128)

    for layout in ("by_dst", "by_src"):
        a, b = native[layout], numpy_[layout]
        assert a.keys() == b.keys()
        for field in a:
            np.testing.assert_array_equal(
                np.asarray(a[field]),
                np.asarray(b[field]),
                err_msg=f"{layout}.{field}",
            )


@pytest.mark.skipif(load_native() is None, reason="no native toolchain")
def test_native_compact_and_filter():
    import ctypes

    lib = load_native()
    sorted_ids = np.array([2, 5, 7, 11, 20], np.int64)
    src = np.array([2, 5, 99, 11], np.int64)
    dst = np.array([5, 98, 7, 20], np.int64)
    rel = np.array([0, 1, 2, 3], np.int64)
    out_s = np.empty(4, np.int64)
    out_d = np.empty(4, np.int64)
    out_r = np.empty(4, np.int64)

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    kept = lib.compact_and_filter(
        p(sorted_ids), ctypes.c_int64(5), p(src), p(dst), p(rel),
        ctypes.c_int64(4), p(out_s), p(out_d), p(out_r),
    )
    # (2->5) kept as (0,1); (5->98) dropped; (99->7) dropped; (11->20) kept
    assert kept == 2
    np.testing.assert_array_equal(out_s[:2], [0, 3])
    np.testing.assert_array_equal(out_d[:2], [1, 4])
    np.testing.assert_array_equal(out_r[:2], [0, 3])
