"""ctypes bridge to the native OT library (counterpart of the reference's
SpaDOT/utils/OT_loss/ot_func.py ctypes layer, re-designed for the log-domain
ABI of ot_cpu.cpp)."""
import ctypes
from ctypes import c_double, c_float, c_int, c_int64

import numpy as np
from numpy.ctypeslib import ndpointer

from spadot_tpu.native.build import ensure_built

_lib = None


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.cdll.LoadLibrary(ensure_built())
        f64 = ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
        f32 = ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
        _lib.spadot_sinkhorn_f64.argtypes = [
            f64, c_int64, c_int64, f64, c_double, c_double, c_double,
            c_double, c_int, c_double, c_int64, f64,
        ]
        _lib.spadot_sinkhorn_f64.restype = c_int
        _lib.spadot_sinkhorn_f32.argtypes = [
            f32, c_int64, c_int64, f32, c_float, c_float, c_float,
            c_float, c_int, c_float, c_int64, f32,
        ]
        _lib.spadot_sinkhorn_f32.restype = c_int
        _lib.spadot_lse_rows_f64.argtypes = [
            f64, c_int64, c_int64, f64, f64, c_double, f64,
        ]
        _lib.spadot_lse_rows_f64.restype = None
        _lib.spadot_duality_gap_f64.argtypes = [
            f64, c_int64, c_int64, f64, f64, f64, f64, c_double, c_double,
            c_double,
        ]
        _lib.spadot_duality_gap_f64.restype = c_double
    return _lib


def sinkhorn_duality_gap_cpu(
    C, G, lambda1, lambda2, epsilon, batch_size, tolerance, epsilon0,
    max_iter, dtype=np.float64, **ignored,
):
    """Native solver entry; same contract as sinkhorn_duality_gap_np."""
    lib = _load()
    C = np.ascontiguousarray(C, dtype=dtype)
    G = np.ascontiguousarray(G, dtype=dtype)
    I, J = C.shape
    R = np.zeros((I, J), dtype=dtype)
    fn = lib.spadot_sinkhorn_f64 if dtype == np.float64 else lib.spadot_sinkhorn_f32
    status = fn(
        C, I, J, G, dtype(lambda1), dtype(lambda2), dtype(epsilon),
        dtype(epsilon0), int(batch_size), dtype(tolerance), int(max_iter), R,
    )
    if status == 1:
        raise RuntimeError("Overflow encountered in duality gap computation")
    if status == 2:
        print("Warning: native solver reached max_iter; returning current plan")
    return R


def lse_rows_cpu(C, g, ldy, inv_eps):
    lib = _load()
    C = np.ascontiguousarray(C, dtype=np.float64)
    out = np.zeros(C.shape[0])
    lib.spadot_lse_rows_f64(
        C, C.shape[0], C.shape[1],
        np.ascontiguousarray(g, dtype=np.float64),
        np.ascontiguousarray(ldy, dtype=np.float64),
        float(inv_eps), out,
    )
    return out


def duality_gap_cpu(C, f, g, p, q, eps, lambda1, lambda2):
    lib = _load()
    C = np.ascontiguousarray(C, dtype=np.float64)
    return lib.spadot_duality_gap_f64(
        C, C.shape[0], C.shape[1],
        np.ascontiguousarray(f, dtype=np.float64),
        np.ascontiguousarray(g, dtype=np.float64),
        np.ascontiguousarray(p, dtype=np.float64),
        np.ascontiguousarray(q, dtype=np.float64),
        float(eps), float(lambda1), float(lambda2),
    )
