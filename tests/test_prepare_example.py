"""examples/prepare_chickenheart.py — the dataset-assembly side artifact
(reference analyses/process_ChickenHeart.py:1-85): 10x-HDF5 reading,
coordinate merge, rotation rule, and output schema, on synthetic fixtures
(the real GSE149457 downloads are unavailable offline)."""
import os
import subprocess
import sys

import h5py
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "examples", "prepare_chickenheart.py")
sys.path.insert(0, os.path.join(REPO, "examples"))


def _write_10x_h5(path, counts, barcodes, genes):
    """CellRanger v3 layout: CSC with genes as rows, barcodes as columns."""
    m = sp.csc_matrix(counts.T)
    with h5py.File(path, "w") as f:
        g = f.create_group("matrix")
        g.create_dataset("data", data=m.data)
        g.create_dataset("indices", data=m.indices)
        g.create_dataset("indptr", data=m.indptr)
        g.create_dataset("shape", data=np.array(m.shape, np.int64))
        g.create_dataset(
            "barcodes", data=np.array([b.encode() for b in barcodes])
        )
        feat = g.create_group("features")
        feat.create_dataset("name", data=np.array([x.encode() for x in genes]))
        feat.create_dataset("id", data=np.array([x.encode() for x in genes]))


@pytest.fixture()
def fixture_dir(tmp_path):
    rng = np.random.default_rng(0)
    genes = ["G0", "G1", "G2", "G1"]  # one duplicate -> dropped
    days = [("GSM4502482", "D4"), ("GSM4502483", "D7"),
            ("GSM4502484", "D10"), ("GSM4502485", "D14")]
    for i, (gsm, day) in enumerate(days):
        n = 5 + i
        barcodes = [f"BC{j}-1" for j in range(n)]
        counts = rng.integers(0, 4, size=(n, len(genes)))
        _write_10x_h5(
            tmp_path / (f"{gsm}_chicken_heart_spatial_RNAseq_{day}"
                        "_filtered_feature_bc_matrix.h5"),
            counts, barcodes, genes,
        )
        pos = pd.DataFrame({
            0: barcodes, 1: 1,
            2: np.arange(n), 3: np.arange(n),
            4: 10.0 * np.arange(n) + i,       # pixel_x
            5: 100.0 * np.arange(n) + i,      # pixel_y
        })
        pos.to_csv(
            tmp_path / f"chicken_heart_spatial_RNAseq_{day}"
            "_tissue_positions_list.csv",
            header=False, index=False,
        )
    return tmp_path


def test_prepare_chickenheart_schema_and_rotation(fixture_dir, tmp_path):
    out = tmp_path / "CH.h5ad"
    proc = subprocess.run(
        [sys.executable, SCRIPT, str(fixture_dir), str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    from spadot_tpu.io import read_h5ad

    ad = read_h5ad(str(out))
    # schema the preprocess stage requires
    assert "timepoint" in ad.obs.columns
    assert sorted(set(ad.obs["timepoint"])) == [0, 1, 2, 3]
    assert ad.obsm["spatial"].shape == (ad.X.shape[0], 2)
    assert ad.X.shape == (5 + 6 + 7 + 8, 3)  # duplicate gene dropped
    # rotation rule: tp 0 -> (-y, -x); tp 1..3 -> (y, x)
    tp = ad.obs["timepoint"].to_numpy()
    sp_xy = np.asarray(ad.obsm["spatial"])
    raw_x = ad.obs["barcode"].str.extract(r"BC(\d+)").to_numpy(float)[:, 0]
    # sample i wrote pixel_x = 10*j + i, pixel_y = 100*j + i (fixture)
    want_px = 10.0 * raw_x + tp
    want_py = 100.0 * raw_x + tp
    exp_x = np.where(tp == 0, -want_py, want_py)
    exp_y = np.where(tp == 0, -want_px, want_px)
    np.testing.assert_allclose(sp_xy[:, 0], exp_x)
    np.testing.assert_allclose(sp_xy[:, 1], exp_y)
    # counts preserved as integers
    X = ad.X.toarray() if hasattr(ad.X, "toarray") else np.asarray(ad.X)
    assert X.dtype.kind in "iu" or np.allclose(X, np.round(X))


def test_prepare_chickenheart_missing_input_message(tmp_path):
    proc = subprocess.run(
        [sys.executable, SCRIPT, str(tmp_path / "nowhere")],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "GSE149457" in (proc.stderr + proc.stdout)
