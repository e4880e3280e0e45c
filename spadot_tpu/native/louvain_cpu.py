"""ctypes bridge to the native Louvain library (louvain_cpu.cpp).

Mirrors the ot_cpu.py pattern: built on demand with g++ (build.py), probed
once, and consumed by spadot_tpu/preprocess/louvain.py as the fast backend
of the SVG-clustering resolution ladder (reference chain:
SpaDOT/utils/_utils.py:195-221)."""
import ctypes

import numpy as np
from numpy.ctypeslib import ndpointer

_lib = None


def _load():
    global _lib
    if _lib is None:
        from spadot_tpu.native.build import ensure_built_louvain

        lib = ctypes.cdll.LoadLibrary(ensure_built_louvain())
        lib.spadot_louvain_csr.restype = ctypes.c_int64
        lib.spadot_louvain_csr.argtypes = [
            ctypes.c_int64,
            ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_double,
            ctypes.c_uint64,
            ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    return _lib


def louvain_available():
    """Probe: build + load the library once; False when g++ is unusable."""
    try:
        _load()
        return True
    except Exception:
        return False


def louvain_csr(A, resolution=1.0, seed=1993):
    """Community labels for a symmetric scipy.sparse adjacency.

    Returns an (n,) int32 label array with communities numbered by first
    appearance. Deterministic for a fixed seed."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    n = A.shape[0]
    indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A.indices, dtype=np.int32)
    weights = np.ascontiguousarray(A.data, dtype=np.float64)
    labels = np.empty(n, dtype=np.int32)
    n_comm = _load().spadot_louvain_csr(
        n, indptr, indices, weights, float(resolution), int(seed) & (2**64 - 1),
        labels,
    )
    if n_comm < 0:
        raise ValueError("spadot_louvain_csr: invalid input")
    return labels
