"""Davies/Imhof/Liu/ACAT/BY statistics + SPARK-X behavior."""
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp
from scipy.stats import chi2

from spadot_tpu.ops.sparkx import sparkx, transform_locations
from spadot_tpu.ops.stats import (
    acat_combine,
    fdr_by,
    imhof_tail,
    imhof_tail_batch,
    liu_tail,
    quadform_pvalues,
)


def test_imhof_equal_weights_matches_chi2():
    """Q = lam * chi2_d when all weights equal -> exact tail available."""
    for lam, d, q in [(0.8, 2, 3.0), (1.5, 3, 10.0), (0.3, 2, 0.5)]:
        exact = chi2.sf(q / lam, df=d)
        got = imhof_tail(q, np.full(d, lam))
        np.testing.assert_allclose(got, exact, atol=1e-4)
        got_b = imhof_tail_batch(np.array([q]), np.full((1, d), lam))[0]
        np.testing.assert_allclose(got_b, exact, atol=1e-5)


def test_imhof_unequal_weights_vs_quad():
    lams = np.array([2.0, 1.0, 0.5])
    for q in [1.0, 3.5, 8.0]:
        ref = imhof_tail(q, lams)
        got = imhof_tail_batch(np.array([q]), lams[None, :])[0]
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_liu_close_to_imhof():
    lams = np.array([1.2, 0.9])
    for q in [2.0, 6.0]:
        np.testing.assert_allclose(
            liu_tail(q, lams), imhof_tail(q, lams), atol=5e-3
        )


def test_quadform_pvalues_batch(rng):
    G = 50
    lams = np.abs(rng.normal(1, 0.2, size=(G, 2)))
    stats = rng.uniform(0.5, 10, G)
    p = quadform_pvalues(stats, lams)
    assert ((p >= 0) & (p <= 1)).all()
    # element-wise agreement with scalar Imhof
    for i in range(0, G, 10):
        np.testing.assert_allclose(p[i], imhof_tail(stats[i], lams[i]), atol=1e-4)


def test_acat_properties():
    assert acat_combine([0.5, 0.5]) == pytest.approx(0.5, abs=1e-9)
    assert acat_combine([0.0, 0.3]) == 0.0
    small = acat_combine([1e-8, 0.5])
    assert 0 < small < 1e-6


def test_fdr_by_matches_known():
    p = np.array([0.01, 0.02, 0.03, 0.5])
    n = 4
    cm = sum(1 / i for i in range(1, n + 1))
    expected_first = min(1.0, min(
        p[0] * n * cm / 1, p[1] * n * cm / 2, p[2] * n * cm / 3, p[3] * n * cm / 4
    ))
    got = fdr_by(p)
    np.testing.assert_allclose(got[0], expected_first, rtol=1e-12)
    assert (np.diff(got[np.argsort(p)]) >= -1e-12).all()


def test_transform_locations_shapes(rng):
    coord = rng.uniform(0, 10, size=(40, 2))
    for lker in range(5):
        g = transform_locations(coord, lker, "gaussian")
        c = transform_locations(coord, lker, "cosine")
        assert g.shape == coord.shape and c.shape == coord.shape
        assert (g <= 1).all() and (g > 0).all()
        assert (np.abs(c) <= 1).all()


def test_sparkx_separates_spatial_from_random(rng):
    """Spatially-patterned genes must rank above spatially-random ones."""
    n = 300
    xy = rng.uniform(0, 10, size=(n, 2))
    n_spatial, n_random = 10, 40
    spatial = np.stack(
        [rng.poisson(np.exp(1.5 * np.sin(xy[:, 0] * (0.5 + 0.1 * j)) + 1.0))
         for j in range(n_spatial)], axis=1,
    )
    random_genes = rng.poisson(3.0, size=(n, n_random))
    counts = sp.csr_matrix(np.hstack([spatial, random_genes]).astype(float))
    names = np.array([f"s{j}" for j in range(n_spatial)] + [f"r{j}" for j in range(n_random)])
    res = sparkx(counts, xy, names, option="mixture")
    top10 = set(res.index[:n_spatial])
    assert len(top10 & {f"s{j}" for j in range(n_spatial)}) >= 8
    # spatial genes significant, random not overwhelmingly so
    sig = res.loc[[f"s{j}" for j in range(n_spatial)], "adjustedPval"]
    assert (sig < 0.05).all()
