"""h5ad IO round-trip and AnnData-lite semantics."""
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from spadot_tpu.io import AnnData, concat, read_h5ad


def _make(n=12, g=5):
    rng = np.random.default_rng(0)
    obs = pd.DataFrame(
        {
            "timepoint": [0] * (n // 2) + [1] * (n - n // 2),
            "label": pd.Categorical(["a", "b"] * (n // 2)),
            "score": rng.normal(size=n),
        },
        index=[f"cell{i}" for i in range(n)],
    )
    return AnnData(
        rng.poisson(2.0, size=(n, g)).astype(np.float64),
        obs=obs,
        var=pd.DataFrame(index=[f"g{j}" for j in range(g)]),
        obsm={"spatial": rng.uniform(size=(n, 2))},
        layers={"counts": sp.csr_matrix(np.ones((n, g)))},
        uns={"note": "hello", "k": 3},
    )


def test_roundtrip_dense(tmp_path):
    ad = _make()
    path = str(tmp_path / "t.h5ad")
    ad.write_h5ad(path)
    ad2 = read_h5ad(path)
    np.testing.assert_allclose(ad2.toarray(), ad.toarray())
    assert list(ad2.obs_names) == list(ad.obs_names)
    assert list(ad2.var_names) == list(ad.var_names)
    assert ad2.obs["timepoint"].tolist() == ad.obs["timepoint"].tolist()
    assert list(ad2.obs["label"]) == list(ad.obs["label"])
    np.testing.assert_allclose(ad2.obsm["spatial"], ad.obsm["spatial"])
    assert sp.issparse(ad2.layers["counts"])
    assert ad2.uns["note"] == "hello"


def test_roundtrip_sparse_X(tmp_path):
    ad = _make()
    ad.X = sp.csr_matrix(ad.X)
    path = str(tmp_path / "s.h5ad")
    ad.write_h5ad(path)
    ad2 = read_h5ad(path)
    assert sp.issparse(ad2.X)
    np.testing.assert_allclose(ad2.toarray(), ad.toarray())


def test_subset_by_bool_int_label():
    ad = _make()
    mask = ad.obs["timepoint"].to_numpy() == 1
    sub = ad[mask]
    assert sub.n_obs == mask.sum()
    sub2 = ad[np.array([0, 2, 4])]
    assert list(sub2.obs_names) == ["cell0", "cell2", "cell4"]
    sub3 = ad[:, np.array(["g1", "g3"])]
    assert list(sub3.var_names) == ["g1", "g3"]
    np.testing.assert_allclose(sub3.toarray(), ad.toarray()[:, [1, 3]])


def test_concat_inner_join():
    ad = _make()
    a = ad[:6]
    b = ad[6:]
    cc = concat([a, b])
    assert cc.n_obs == ad.n_obs
    np.testing.assert_allclose(cc.toarray(), ad.toarray())
    assert "spatial" in cc.obsm and cc.obsm["spatial"].shape == (12, 2)


def test_anndata_upstream_compat(tmp_path):
    """Files we write should be readable by upstream anndata if present."""
    anndata = pytest.importorskip("anndata")
    ad = _make()
    path = str(tmp_path / "c.h5ad")
    ad.write_h5ad(path)
    up = anndata.read_h5ad(path)
    np.testing.assert_allclose(np.asarray(up.X), ad.toarray())


def test_nullable_and_unknown_encodings(tmp_path):
    """Real anndata files carry nullable-integer columns and occasionally
    exotic encodings — read what we can, skip what we can't."""
    import h5py
    import warnings

    ad = _make()
    path = str(tmp_path / "n.h5ad")
    ad.write_h5ad(path)
    with h5py.File(path, "r+") as f:
        g = f["obs"].create_group("n_counts")
        g.attrs["encoding-type"] = "nullable-integer"
        g.attrs["encoding-version"] = "0.1.0"
        g.create_dataset("values", data=np.arange(12))
        mask = np.zeros(12, bool)
        mask[3] = True
        g.create_dataset("mask", data=mask)
        weird = f["obs"].create_group("weird")
        weird.attrs["encoding-type"] = "某-unknown"
        order = list(f["obs"].attrs["column-order"]) + [b"n_counts", b"weird"]
        f["obs"].attrs["column-order"] = np.array(
            [o.decode() if isinstance(o, bytes) else o for o in order], dtype=object
        )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ad2 = read_h5ad(path)
    assert "n_counts" in ad2.obs.columns
    assert np.isnan(ad2.obs["n_counts"].iloc[3])
    assert ad2.obs["n_counts"].iloc[0] == 0
    assert "weird" not in ad2.obs.columns
    # required pipeline columns intact
    assert ad2.obs["timepoint"].tolist() == ad.obs["timepoint"].tolist()
