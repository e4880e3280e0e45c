"""Golden loss-curve parity locks vs the reference's published ChickenHeart run.

The reference ships examples/ChickenHeart_output/loss.csv (100 epochs of the
published run — the de-facto regression fixture; BASELINE.md rows 4-5). The
real input h5ads are not shipped, so docs/parity/loss_float{32,64}.csv are
produced by examples/parity_run.py at the EXACT reference shape (4 timepoints
of 747/1966/1916/1967 spots, 2954 genes, batch 512, 1200 inducing points, 100
epochs) on synthetic standardized data. These tests lock the committed curves
against the reference anchors:

- identical loss.csv schema and length;
- identical loss-schedule structure (KMeans onset at epoch 1, OT onset at
  epoch 50 — train.py epoch gates);
- epoch-0 per-component magnitudes inside documented bands around the
  reference values (epoch 0 is data-scale-determined: every gene enters
  standardized, so magnitudes transfer from real to synthetic data);
- the float64 run (the reference's training dtype, SpaDOT/train.py:27)
  agrees with float32 at epoch 0 — the f32-vs-f64 ablation of SURVEY §7.

Bands and rationale: docs/parity.md.
"""
import os

import numpy as np
import pandas as pd
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
PARITY_DIR = os.path.join(HERE, "..", "docs", "parity")

# reference examples/ChickenHeart_output/loss.csv row 0
REF_EPOCH0 = dict(elbo=199.93, Recon=1980.31, SVGP_KL=-144.39,
                  GAT_KL=2619.27, alignment=16.36, KMeans=0.0, OT=0.0)
COLUMNS = ["elbo", "Recon", "SVGP_KL", "GAT_KL", "alignment", "KMeans", "OT"]

# (low, high) multiplicative bands on the epoch-0 ratio ours/ref. Recon/elbo
# are tight (standardized data fixes their scale); GAT_KL is prior-KL of a
# freshly-initialized encoder (init-seed dependent); alignment compares two
# random-init branch norms; SVGP_KL depends on the spatial autocorrelation of
# the coordinates (uniform synthetic vs structured tissue) so only sign and
# order of magnitude are checkable.
EPOCH0_BANDS = {
    "elbo": (0.7, 1.4),
    "Recon": (0.7, 1.4),
    "GAT_KL": (0.5, 2.0),
    "alignment": (0.2, 4.0),
}


def _load(dtype):
    path = os.path.join(PARITY_DIR, f"loss_{dtype}.csv")
    if not os.path.exists(path):
        pytest.skip(f"{path} not committed")
    return pd.read_csv(path, index_col=0)


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_schema_and_schedule(dtype):
    df = _load(dtype)
    assert list(df.columns) == COLUMNS
    assert len(df) == 100
    # KMeans loss enters at epoch 1 (train loop epoch>0 gate)
    assert df["KMeans"].iloc[0] == 0.0
    assert (df["KMeans"].iloc[1:] > 0).all()
    # OT loss enters at epoch 50 (train.py start_OT gate)
    assert (df["OT"].iloc[:50] == 0.0).all()
    assert (df["OT"].iloc[50:] > 0).all()


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_epoch0_anchor_bands(dtype):
    row0 = _load(dtype).iloc[0]
    for comp, (lo, hi) in EPOCH0_BANDS.items():
        ratio = row0[comp] / REF_EPOCH0[comp]
        assert lo <= ratio <= hi, (
            f"{comp}@0 = {row0[comp]:.2f}, ref {REF_EPOCH0[comp]:.2f}, "
            f"ratio {ratio:.2f} outside [{lo}, {hi}]"
        )
    # SVGP_KL: negative (the SpaDOT.py:77 sign trick), sane magnitude
    assert row0["SVGP_KL"] < 0
    assert 1.0 <= -row0["SVGP_KL"] <= 500.0
    assert row0["KMeans"] == 0.0 and row0["OT"] == 0.0


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_curve_shape(dtype):
    """Optimization makes progress the way the reference curve does: Recon
    and elbo fall from their epoch-0 level and the curve stabilizes."""
    df = _load(dtype)
    assert df["Recon"].iloc[-20:].mean() < 0.7 * df["Recon"].iloc[0]
    assert df["elbo"].iloc[-20:].mean() < df["elbo"].iloc[0]
    # no NaN/inf anywhere in 100 epochs
    assert np.isfinite(df.to_numpy()).all()


def test_float64_trajectory_band():
    """The FULL 100-epoch f32 trajectory tracks the f64 one (the reference's
    training dtype), not just epoch 0 — the ablation evidence behind training
    in f32 on TPU. RNG divergence (x64 mode consumes different init bits)
    makes pointwise equality impossible, so the lock is on rolling-10
    smoothed curves and on the converged (final-20-epoch) means. Measured
    slack on the committed curves: smoothed deltas peak at 5.6% on
    elbo/Recon and the final-20 ratios sit within 1.05 on every component."""
    f32, f64 = _load("float32"), _load("float64")
    r32 = f32.rolling(10, min_periods=1).mean()
    r64 = f64.rolling(10, min_periods=1).mean()
    rel = (r32 - r64).abs() / r64.abs().clip(lower=1e-3)
    bands = {"elbo": 0.10, "Recon": 0.10, "SVGP_KL": 0.30, "GAT_KL": 0.20,
             "KMeans": 0.25, "OT": 0.15}
    for comp, band in bands.items():
        assert rel[comp].max() < band, (comp, rel[comp].max())
    final32 = f32.iloc[-20:].mean()
    final64 = f64.iloc[-20:].mean()
    for comp in COLUMNS:
        ratio = final32[comp] / final64[comp]
        assert 0.9 <= ratio <= 1.1, (comp, ratio)


def test_float64_agrees_with_float32_at_epoch0():
    """The f32 production dtype reproduces the reference's f64 training at
    initialization (before trajectories chaotically diverge): SURVEY §7 hard
    part (d)."""
    f32 = _load("float32").iloc[0]
    f64 = _load("float64").iloc[0]
    # elbo/Recon are data-scale-determined -> tight. GAT_KL at epoch 0 is the
    # prior-KL of the freshly initialized encoder, and x64 mode consumes
    # different RNG bits for the init draws (jax.random uniform widths), so
    # the two dtypes start from genuinely different parameters -> loose.
    for comp in ("elbo", "Recon"):
        assert abs(f32[comp] / f64[comp] - 1.0) < 0.05, comp
    assert abs(f32["GAT_KL"] / f64["GAT_KL"] - 1.0) < 0.25
