"""Native C++ Sinkhorn library vs the numpy float64 backend."""
import shutil

import numpy as np
import pytest
from scipy.spatial.distance import cdist

from spadot_tpu.ops.sinkhorn import sinkhorn_duality_gap_np

g_pp = shutil.which("g++")
pytestmark = pytest.mark.skipif(g_pp is None, reason="no g++ toolchain")

PARAMS = dict(
    lambda1=0.1, lambda2=5.0, epsilon=0.05, batch_size=5,
    tolerance=1e-8, epsilon0=1, max_iter=10_000_000,
)


@pytest.fixture(scope="module")
def native():
    from spadot_tpu.native import ot_cpu

    ot_cpu._load()
    return ot_cpu


def _problem(rng, I=10, J=12):
    a = rng.normal(0, 2, (I, 20))
    b = rng.normal(0.5, 2, (J, 20))
    C = cdist(a, b, "sqeuclidean")
    return C / np.median(C)


def test_native_matches_numpy(native, rng):
    C = _problem(rng)
    G = np.ones(C.shape[0])
    R_np = sinkhorn_duality_gap_np(C, G, **PARAMS)
    R_c = native.sinkhorn_duality_gap_cpu(C, G, **PARAMS)
    np.testing.assert_allclose(R_c, R_np, rtol=1e-7)


def test_native_nonuniform_growth(native, rng):
    C = _problem(rng, 8, 15)
    G = rng.uniform(0.5, 2.0, 8)
    R_np = sinkhorn_duality_gap_np(C, G, **PARAMS)
    R_c = native.sinkhorn_duality_gap_cpu(C, G, **PARAMS)
    np.testing.assert_allclose(R_c, R_np, rtol=1e-6)


def test_native_f32_close(native, rng):
    C = _problem(rng)
    G = np.ones(C.shape[0])
    R_np = sinkhorn_duality_gap_np(C, G, **PARAMS)
    R_c = native.sinkhorn_duality_gap_cpu(C, G, dtype=np.float32, **PARAMS)
    np.testing.assert_allclose(R_c, R_np, rtol=5e-3, atol=1e-7)


def test_lse_rows_building_block(native, rng):
    C = rng.normal(size=(6, 9))
    g = rng.normal(size=9)
    ldy = np.full(9, -np.log(9))
    inv_eps = 2.0
    got = native.lse_rows_cpu(C, g, ldy, inv_eps)
    M = (g[None, :] - C) * inv_eps + ldy[None, :]
    want = np.log(np.exp(M - M.max(1, keepdims=True)).sum(1)) + M.max(1)
    np.testing.assert_allclose(got, want, rtol=1e-12)
