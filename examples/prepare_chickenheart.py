"""Assemble the ChickenHeart input h5ad from the raw GEO downloads.

Capability parity with the reference's dataset-assembly side artifact
(/root/reference/analyses/process_ChickenHeart.py:1-85): read the four
GSE149457 spatial RNA-seq 10x Genomics HDF5 matrices (D4/D7/D10/D14),
attach the Visium tissue-position pixel coordinates, concatenate with
timepoints 0..3, rotate the pixel coordinates so the sections align
across timepoints ((x, y) <- (pixel_y, pixel_x) for D7/D10/D14;
(x, y) <- (-pixel_y, -pixel_x) for D4 — the reference's orientation
rule), and write `ChickenHeart.h5ad` in the
schema the `SpaDOT preprocess` stage expects (`obs['timepoint']`,
`obsm['spatial']`, integer counts in X). A per-timepoint QC scatter of
the rotated coordinates is saved alongside.

Self-contained: reads the 10x CellRanger HDF5 layout directly with
h5py/scipy (this repo does not depend on scanpy/anndata — see
spadot_tpu/io/anndata_lite.py).

Usage: python examples/prepare_chickenheart.py [data_dir] [out.h5ad]
  data_dir (default .) must contain, per sample:
    GSM4502482_chicken_heart_spatial_RNAseq_D4_filtered_feature_bc_matrix.h5
    chicken_heart_spatial_RNAseq_D4_tissue_positions_list.csv
    ... (D7 / D10 / D14 equivalents, GSM4502483-85)
  (GEO accession GSE149457; this sandbox has no network access, so the
  script exits with a clear message when the files are absent.)
"""
import os
import sys

import numpy as np
import pandas as pd
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spadot_tpu.io import AnnData, concat, write_h5ad  # noqa: E402

# (GSM id, section id, timepoint) — barcodes are prefixed "{day}-{section}_"
SAMPLES = [
    ("GSM4502482", "D4", "A1", 0),
    ("GSM4502483", "D7", "B1", 1),
    ("GSM4502484", "D10", "C1", 2),
    ("GSM4502485", "D14", "D1", 3),
]


def read_10x_h5(path):
    """Minimal CellRanger v3 HDF5 reader -> (csr counts, barcodes, genes).

    Layout: /matrix/{data,indices,indptr,shape} is CSC with genes as rows
    and barcodes as columns; features under /matrix/features/{id,name}.
    """
    import h5py

    with h5py.File(path, "r") as f:
        if "matrix" not in f or "features" not in f["matrix"]:
            raise ValueError(
                f"{path}: not a CellRanger v3 HDF5 matrix (need "
                "/matrix/features) — the GSE149457 files are v3; convert "
                "older layouts first"
            )
        g = f["matrix"]
        n_genes, n_cells = g["shape"][:]
        m = sp.csc_matrix(
            (g["data"][:], g["indices"][:], g["indptr"][:]),
            shape=(n_genes, n_cells),
        )
        barcodes = [b.decode() for b in g["barcodes"][:]]
        names = [b.decode() for b in g["features"]["name"][:]]
    return m.T.tocsr(), barcodes, names


def read_positions(path):
    """Visium tissue_positions_list.csv (headerless): barcode, in_tissue,
    array row/col, pixel row/col."""
    pos = pd.read_csv(path, header=None, index_col=0)
    pos.columns = ["in_out", "x", "y", "pixel_x", "pixel_y"]
    return pos


def load_sample(data_dir, gsm, day, section, timepoint):
    mat_path = os.path.join(
        data_dir,
        f"{gsm}_chicken_heart_spatial_RNAseq_{day}_filtered_feature_bc_matrix.h5",
    )
    pos_path = os.path.join(
        data_dir, f"chicken_heart_spatial_RNAseq_{day}_tissue_positions_list.csv"
    )
    for p in (mat_path, pos_path):
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"{p} not found — download GSE149457 supplementary files "
                "into the data dir first"
            )
    counts, barcodes, genes = read_10x_h5(mat_path)
    # drop duplicated gene names (keep first), as the reference does
    keep = ~pd.Index(genes).duplicated()
    counts = counts[:, np.flatnonzero(keep)]
    genes = list(pd.Index(genes)[keep])
    pos = read_positions(pos_path)
    pos = pos.reindex(barcodes)
    obs = pd.DataFrame(
        {
            "barcode": barcodes,
            "orig.ident": day,
            "timepoint": timepoint,
            "pixel_x": pos["pixel_x"].to_numpy(),
            "pixel_y": pos["pixel_y"].to_numpy(),
        },
        index=[f"{day}-{section}_{b}" for b in barcodes],
    )
    ad = AnnData(counts.astype(np.int32), obs=obs,
                 var=pd.DataFrame({"gene": genes}, index=genes))
    return ad


def main():
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "."
    out = sys.argv[2] if len(sys.argv) > 2 else "ChickenHeart.h5ad"
    parts = []
    for gsm, day, section, tp in SAMPLES:
        ad = load_sample(data_dir, gsm, day, section, tp)
        print(f"{day}: {ad.X.shape[0]} spots x {ad.X.shape[1]} genes")
        parts.append(ad)
    adata = concat(parts, axis=0)

    # rotate pixel coordinates into a shared orientation: D7/D10/D14 swap
    # (x, y) <- (y, x); D4 gets (x, y) <- (-y, -x)
    px = adata.obs["pixel_x"].to_numpy().astype(np.float64)
    py = adata.obs["pixel_y"].to_numpy().astype(np.float64)
    tp = adata.obs["timepoint"].to_numpy()
    flip = tp == 0
    new_x = np.where(flip, -py, py)
    new_y = np.where(flip, -px, px)
    adata.obs["pixel_x"] = new_x
    adata.obs["pixel_y"] = new_y
    adata.obsm["spatial"] = np.column_stack([new_x, new_y])

    write_h5ad(out, adata)
    print(f"wrote {out}: {adata.X.shape[0]} spots x {adata.X.shape[1]} genes, "
          f"{len(set(tp.tolist()))} timepoints")

    # QC scatter per timepoint to confirm the rotation
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plot_dir = os.path.dirname(os.path.abspath(out))
        for t in sorted(set(tp.tolist())):
            rows = tp == t
            plt.figure(figsize=(6, 6))
            plt.scatter(new_x[rows], new_y[rows], s=1, alpha=0.7)
            plt.title(f"Timepoint {t}")
            plt.xlabel("Pixel X")
            plt.ylabel("Pixel Y")
            plt.savefig(
                os.path.join(plot_dir, f"spatial_coordinates_{t}.png")
            )
            plt.close()
    except Exception as e:  # pragma: no cover - plotting is best-effort QC
        print(f"QC plots skipped: {e}")


if __name__ == "__main__":
    main()
