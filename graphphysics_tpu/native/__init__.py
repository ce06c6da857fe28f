"""ctypes bindings for the native host-side graph kernels.

Builds ``libgraphnative.so`` from ``graph_native.cpp`` with g++ on first use
(cached next to the source); every entry point has a numpy fallback, so the
package works without a compiler (set ``GRAPHPHYSICS_TPU_NATIVE=0`` to force
the fallbacks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libgraphnative.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    tmp = _LIB_PATH + f".tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, _LIB_PATH)  # atomic: concurrent builders race safely
        return _LIB_PATH
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable/disabled."""
    global _lib, _tried
    if os.environ.get("GRAPHPHYSICS_TPU_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            i64p = ctypes.POINTER(ctypes.c_int64)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.gn_face_to_edge.restype = ctypes.c_int64
            lib.gn_face_to_edge.argtypes = [
                i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
            ]
            lib.gn_k_hop.restype = ctypes.c_int64
            lib.gn_k_hop.argtypes = [
                i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                i64p, i64p, ctypes.c_int64,
            ]
            lib.gn_build_ell.restype = ctypes.c_int64
            lib.gn_build_ell.argtypes = [
                i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                i64p, u8p, i64p, i64p,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _i64(a: np.ndarray):
    return np.ascontiguousarray(a, dtype=np.int64)


def _ptr(a: np.ndarray, typ=ctypes.c_int64):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def face_to_edge_native(
    faces: np.ndarray, num_nodes: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    faces = _i64(faces)
    cap = 6 * len(faces)
    out_s = np.empty(cap, np.int64)
    out_r = np.empty(cap, np.int64)
    n = lib.gn_face_to_edge(
        _ptr(faces), len(faces), int(num_nodes), _ptr(out_s), _ptr(out_r)
    )
    return out_s[:n].astype(np.int32), out_r[:n].astype(np.int32)


def k_hop_native(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int, k: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    s = _i64(senders)
    r = _i64(receivers)
    cap = max(len(s) * (4 ** min(k, 6)), len(s) + 1024)
    while True:
        out_s = np.empty(cap, np.int64)
        out_r = np.empty(cap, np.int64)
        n = lib.gn_k_hop(
            _ptr(s), _ptr(r), len(s), int(num_nodes), int(k),
            _ptr(out_s), _ptr(out_r), cap,
        )
        if n >= 0:
            break
        cap *= 2
    # sort by (sender, receiver) to match the scipy path's canonical order
    order = np.lexsort((out_r[:n], out_s[:n]))
    return out_s[:n][order].astype(np.int32), out_r[:n][order].astype(np.int32)


def build_ell_native(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int, degree: int
):
    """Returns (senders_ell, mask, edge_perm, twin_perm) or None; raises
    ValueError on overflow/asymmetry like the numpy path."""
    lib = get_lib()
    if lib is None:
        return None
    s = _i64(senders)
    r = _i64(receivers)
    slots = int(num_nodes) * int(degree)
    senders_ell = np.empty(slots, np.int64)
    mask = np.empty(slots, np.uint8)
    edge_perm = np.empty(slots, np.int64)
    twin_perm = np.empty(slots, np.int64)
    rc = lib.gn_build_ell(
        _ptr(s), _ptr(r), len(s), int(num_nodes), int(degree),
        _ptr(senders_ell), _ptr(mask, ctypes.c_uint8), _ptr(edge_perm),
        _ptr(twin_perm),
    )
    if rc == -1:
        raise ValueError(f"max in-degree exceeds ELL degree {degree}")
    if rc == -2:
        raise ValueError("edge list is not symmetric: missing reverse twin")
    return (
        senders_ell.astype(np.int32),
        mask.astype(bool),
        edge_perm.astype(np.int32),
        twin_perm.astype(np.int32),
    )
