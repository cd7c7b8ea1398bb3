"""ctypes bindings for the native C++ graph builder (``native/graphbuild.cpp``).

Auto-builds ``libgraphbuild.so`` with the in-repo Makefile on first use and
degrades to the NumPy implementations when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgraphbuild.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if os.environ.get("RELGAT_NO_NATIVE"):
        return None
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src_path = os.path.join(_NATIVE_DIR, "graphbuild.cpp")
        stale = (
            os.path.isfile(_LIB_PATH)
            and os.path.isfile(src_path)
            and os.path.getmtime(src_path) > os.path.getmtime(_LIB_PATH)
        )
        if (not os.path.isfile(_LIB_PATH) or stale) and os.path.isdir(
            _NATIVE_DIR
        ):
            subprocess.run(
                ["make", "-s", "-B", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.blocked_phase1.restype = ctypes.c_int64
        lib.compact_and_filter.restype = ctypes.c_int64
        lib.lpa_refine.restype = ctypes.c_int64
        lib.bfs_grow.restype = None
        _lib = lib
    except Exception as exc:  # no toolchain / unreadable: numpy fallback
        print(f"[native] graphbuild unavailable ({exc}); using NumPy path")
        _lib = None
    return _lib


def native_blocked_arrays(
    keys: np.ndarray,   # [E] int64 partition key (dst or src)
    src: np.ndarray,    # [E] int32
    dst: np.ndarray,    # [E] int32
    etype: np.ndarray,  # [E] int32
    num_nodes: int,
    td: int,
    te: int,
):
    """Run both native phases; returns the arrays of ``BlockedEdges`` (as
    NumPy) or None if the native library is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    e = int(keys.shape[0])
    nb = -(-num_nodes // td)
    keys = np.ascontiguousarray(keys, np.int64)
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    etype = np.ascontiguousarray(etype, np.int32)

    order = np.empty(e, np.int64)
    counts = np.empty(nb, np.int64)
    padded = np.empty(nb, np.int64)
    slots_total = int(
        lib.blocked_phase1(
            _i64p(keys), ctypes.c_int64(e), ctypes.c_int64(num_nodes),
            ctypes.c_int64(td), ctypes.c_int64(te),
            _i64p(order), _i64p(counts), _i64p(padded),
        )
    )
    if slots_total == 0:
        return None  # degenerate; let the NumPy path handle it

    num_chunks = slots_total // te
    src_b = np.empty(slots_total, np.int32)
    dst_b = np.empty(slots_total, np.int32)
    et_b = np.empty(slots_total, np.int32)
    mask_b = np.empty(slots_total, np.float32)
    local_b = np.empty(slots_total, np.int32)
    chunk_block = np.empty(num_chunks, np.int32)
    slot_of_edge = np.empty(e, np.int32)
    block_nonempty = np.empty(nb, np.float32)
    chunk_meta = np.empty((num_chunks, 8, te), np.int32)
    edge_of_slot = np.empty(slots_total, np.int32)

    lib.blocked_phase2(
        _i64p(keys), _i32p(src), _i32p(dst), _i32p(etype),
        ctypes.c_int64(e), ctypes.c_int64(num_nodes),
        ctypes.c_int64(td), ctypes.c_int64(te),
        _i64p(order), _i64p(counts), _i64p(padded),
        _i32p(src_b), _i32p(dst_b), _i32p(et_b), _f32p(mask_b),
        _i32p(local_b), _i32p(chunk_block), _i32p(slot_of_edge),
        _f32p(block_nonempty), _i32p(chunk_meta), _i32p(edge_of_slot),
    )
    return dict(
        src=src_b, dst=dst_b, etype=et_b, mask=mask_b, local_seg=local_b,
        chunk_block=chunk_block, slot_of_edge=slot_of_edge,
        block_nonempty=block_nonempty, chunk_meta=chunk_meta,
        edge_of_slot=edge_of_slot,
    )


def native_lpa_refine(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    caps: np.ndarray,
    soft_caps: np.ndarray,
    init_labels: np.ndarray,
    max_passes: int,
) -> Optional[np.ndarray]:
    """Async size-constrained label propagation + exact-caps repair in C++
    (``native/graphbuild.cpp lpa_refine``); None if the native library is
    unavailable or rejects the input (numpy fallback then applies)."""
    lib = load_native()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    caps = np.ascontiguousarray(caps, np.int64)
    soft_caps = np.ascontiguousarray(soft_caps, np.int64)
    labels = np.ascontiguousarray(init_labels, np.int64).copy()
    rc = lib.lpa_refine(
        _i64p(src), _i64p(dst), ctypes.c_int64(src.shape[0]),
        ctypes.c_int64(num_nodes), ctypes.c_int64(caps.shape[0]),
        _i64p(caps), _i64p(soft_caps), ctypes.c_int64(max_passes),
        _i64p(labels),
    )
    if rc < 0:
        return None
    return labels


def native_bfs_grow(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    caps: np.ndarray,
) -> Optional[np.ndarray]:
    """Greedy BFS-wave graph growing in C++; None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    caps = np.ascontiguousarray(caps, np.int64)
    labels = np.empty(num_nodes, np.int64)
    lib.bfs_grow(
        _i64p(src), _i64p(dst), ctypes.c_int64(src.shape[0]),
        ctypes.c_int64(num_nodes), ctypes.c_int64(caps.shape[0]),
        _i64p(caps), _i64p(labels),
    )
    return labels
