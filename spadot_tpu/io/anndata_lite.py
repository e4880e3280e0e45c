"""Minimal AnnData implementation over h5py, compatible with the anndata
on-disk h5ad spec (encoding-version >= 0.1.0 attribute conventions).

The environment providing this framework has no `anndata`/`scanpy`, so the
data contract of the reference pipeline (SpaDOT/preprocess.py:20-31,
SpaDOT/train.py:18, SpaDOT/analyze.py:14 — h5ad in / h5ad out) is implemented
here from scratch: dense + CSR/CSC ``X``, pandas-backed ``obs``/``var`` with
categorical and string columns, ``obsm``/``varm``/``layers``/``uns``, row and
column subsetting, and concatenation. Files written here are readable by the
upstream `anndata` package (encoding attrs are emitted per the spec).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import scipy.sparse as sp
import h5py


# ---------------------------------------------------------------------------
# In-memory container
# ---------------------------------------------------------------------------

def _default_index(n, prefix=""):
    return pd.Index([f"{prefix}{i}" for i in range(n)], dtype=object)


class AnnData:
    """A lightweight annotated data matrix: X (n_obs, n_vars) + metadata."""

    def __init__(self, X, obs=None, var=None, obsm=None, varm=None, layers=None, uns=None):
        if sp.issparse(X):
            X = X.tocsr()
        else:
            X = np.asarray(X)
        self.X = X
        n_obs, n_vars = X.shape
        if obs is None:
            obs = pd.DataFrame(index=_default_index(n_obs))
        elif not isinstance(obs, pd.DataFrame):
            obs = pd.DataFrame(obs)
        if var is None:
            var = pd.DataFrame(index=_default_index(n_vars))
        elif not isinstance(var, pd.DataFrame):
            var = pd.DataFrame(var)
        if len(obs) != n_obs:
            raise ValueError(f"obs length {len(obs)} != n_obs {n_obs}")
        if len(var) != n_vars:
            raise ValueError(f"var length {len(var)} != n_vars {n_vars}")
        obs = obs.copy()
        var = var.copy()
        obs.index = obs.index.astype(str)
        var.index = var.index.astype(str)
        self.obs = obs
        self.var = var
        self.obsm = dict(obsm or {})
        self.varm = dict(varm or {})
        self.layers = dict(layers or {})
        self.uns = dict(uns or {})

    # -- basic properties ---------------------------------------------------
    @property
    def n_obs(self):
        return self.X.shape[0]

    @property
    def n_vars(self):
        return self.X.shape[1]

    @property
    def shape(self):
        return self.X.shape

    @property
    def obs_names(self):
        return self.obs.index

    @obs_names.setter
    def obs_names(self, value):
        self.obs.index = pd.Index(value).astype(str)

    @property
    def var_names(self):
        return self.var.index

    @var_names.setter
    def var_names(self, value):
        self.var.index = pd.Index(value).astype(str)

    def __repr__(self):
        parts = [f"AnnDataLite n_obs x n_vars = {self.n_obs} x {self.n_vars}"]
        if len(self.obs.columns):
            parts.append(f"    obs: {list(self.obs.columns)}")
        if len(self.var.columns):
            parts.append(f"    var: {list(self.var.columns)}")
        if self.obsm:
            parts.append(f"    obsm: {list(self.obsm)}")
        if self.layers:
            parts.append(f"    layers: {list(self.layers)}")
        if self.uns:
            parts.append(f"    uns: {list(self.uns)}")
        return "\n".join(parts)

    # -- subsetting ---------------------------------------------------------
    def _resolve_obs_idx(self, idx):
        return _resolve_index(idx, self.obs.index, self.n_obs)

    def _resolve_var_idx(self, idx):
        return _resolve_index(idx, self.var.index, self.n_vars)

    def __getitem__(self, key):
        if isinstance(key, tuple):
            oidx, vidx = key
        else:
            oidx, vidx = key, slice(None)
        oi = self._resolve_obs_idx(oidx)
        vi = self._resolve_var_idx(vidx)
        X = self.X[oi][:, vi] if sp.issparse(self.X) else self.X[np.ix_(oi, vi)]
        sub = AnnData(
            X,
            obs=self.obs.iloc[oi],
            var=self.var.iloc[vi],
            obsm={k: np.asarray(v)[oi] for k, v in self.obsm.items()},
            varm={k: np.asarray(v)[vi] for k, v in self.varm.items()},
            layers={
                k: (v[oi][:, vi] if sp.issparse(v) else np.asarray(v)[np.ix_(oi, vi)])
                for k, v in self.layers.items()
            },
            uns=dict(self.uns),
        )
        return sub

    def copy(self):
        X = self.X.copy()
        return AnnData(
            X,
            obs=self.obs.copy(),
            var=self.var.copy(),
            obsm={k: np.array(v, copy=True) for k, v in self.obsm.items()},
            varm={k: np.array(v, copy=True) for k, v in self.varm.items()},
            layers={k: v.copy() for k, v in self.layers.items()},
            uns=dict(self.uns),
        )

    def toarray(self):
        return self.X.toarray() if sp.issparse(self.X) else np.asarray(self.X)

    # -- io -----------------------------------------------------------------
    def write_h5ad(self, path):
        write_h5ad(path, self)


def _resolve_index(idx, names: pd.Index, n: int) -> np.ndarray:
    """Normalize an indexer (slice/bool/int/str/labels) to integer positions."""
    if isinstance(idx, slice):
        return np.arange(n)[idx]
    idx_arr = np.asarray(idx)
    if idx_arr.ndim == 0:
        idx_arr = idx_arr.reshape(1)
    if idx_arr.dtype == bool:
        if idx_arr.shape[0] != n:
            raise IndexError("boolean index length mismatch")
        return np.where(idx_arr)[0]
    if idx_arr.dtype.kind in "iu":
        return idx_arr.astype(np.int64)
    # label-based
    indexer = names.get_indexer(pd.Index(idx_arr.astype(str)))
    if (indexer < 0).any():
        missing = np.asarray(idx_arr)[indexer < 0][:5]
        raise KeyError(f"labels not found: {missing}")
    return indexer.astype(np.int64)


def concat(adatas, axis=0):
    """Concatenate AnnData objects along obs (axis=0), inner-joining variables.

    Matches the semantics the reference relies on (anndata.concat with default
    join='inner'): SpaDOT/utils/_preprocess_utils.py:51, _train_utils.py:115.
    """
    adatas = list(adatas)
    if axis != 0:
        raise NotImplementedError("only axis=0 concat is supported")
    common = adatas[0].var_names
    for ad in adatas[1:]:
        common = common.intersection(ad.var_names)
    parts = [ad[:, common.to_numpy()] for ad in adatas]
    if any(sp.issparse(p.X) for p in parts):
        X = sp.vstack([sp.csr_matrix(p.X) for p in parts]).tocsr()
    else:
        X = np.vstack([p.toarray() for p in parts])
    obs = pd.concat([p.obs for p in parts], axis=0)
    obsm = {}
    shared_obsm = set(parts[0].obsm)
    for p in parts[1:]:
        shared_obsm &= set(p.obsm)
    for k in shared_obsm:
        obsm[k] = np.concatenate([np.asarray(p.obsm[k]) for p in parts], axis=0)
    layers = {}
    shared_layers = set(parts[0].layers)
    for p in parts[1:]:
        shared_layers &= set(p.layers)
    for k in shared_layers:
        vals = [p.layers[k] for p in parts]
        if any(sp.issparse(v) for v in vals):
            layers[k] = sp.vstack([sp.csr_matrix(v) for v in vals]).tocsr()
        else:
            layers[k] = np.vstack([np.asarray(v) for v in vals])
    return AnnData(X, obs=obs, var=parts[0].var.copy(), obsm=obsm, layers=layers)


# ---------------------------------------------------------------------------
# h5ad reading
# ---------------------------------------------------------------------------

def _decode(x):
    if isinstance(x, bytes):
        return x.decode("utf-8")
    return x


def _read_array(node):
    """Read a dataset or an encoded group (sparse/categorical/etc.)."""
    if isinstance(node, h5py.Dataset):
        arr = node[()]
        if isinstance(arr, (bytes, str)):
            return _decode(arr)
        if np.isscalar(arr):
            return arr
        if arr.dtype.kind in ("S", "O"):
            arr = np.array([_decode(v) for v in np.ravel(arr)], dtype=object).reshape(arr.shape)
        return arr
    enc = _decode(node.attrs.get("encoding-type", ""))
    if enc in ("csr_matrix", "csc_matrix"):
        shape = tuple(node.attrs["shape"])
        data = node["data"][()]
        indices = node["indices"][()]
        indptr = node["indptr"][()]
        cls = sp.csr_matrix if enc == "csr_matrix" else sp.csc_matrix
        return cls((data, indices, indptr), shape=shape)
    if enc == "categorical":
        categories = _read_array(node["categories"])
        codes = node["codes"][()]
        return pd.Categorical.from_codes(codes, categories=pd.Index(np.ravel(categories)))
    if enc in ("nullable-integer", "nullable-boolean"):
        values = np.asarray(node["values"][()])
        mask = np.asarray(node["mask"][()]).astype(bool)
        out = values.astype(np.float64)
        out[mask] = np.nan  # mask marks missing entries in the anndata spec
        return out
    if enc in ("dict", ""):
        return {k: _read_array(node[k]) for k in node.keys()}
    raise ValueError(f"Unsupported h5ad encoding: {enc!r} at {node.name}")


def _read_dataframe(group):
    enc = _decode(group.attrs.get("encoding-type", ""))
    if enc and enc != "dataframe":
        raise ValueError(f"expected dataframe at {group.name}, got {enc}")
    index_key = _decode(group.attrs.get("_index", "_index"))
    index = np.ravel(_read_array(group[index_key]))
    raw_order = group.attrs.get("column-order", [])
    if isinstance(raw_order, h5py.Empty):
        raw_order = []
    col_order = [_decode(c) for c in raw_order]
    cols = {}
    for key in col_order if col_order else [k for k in group.keys() if k != index_key]:
        if key == index_key or key not in group:
            continue
        try:
            val = _read_array(group[key])
        except ValueError:
            # unknown column encoding: skip the column rather than fail the
            # whole file — the pipeline only requires specific columns
            import warnings

            warnings.warn(f"skipping obs/var column {key!r} (unsupported encoding)")
            continue
        if isinstance(val, np.ndarray):
            val = np.ravel(val)
        cols[key] = val
    df = pd.DataFrame(cols, index=pd.Index(index).astype(str))
    return df


def read_h5ad(path) -> AnnData:
    with h5py.File(path, "r") as f:
        X = _read_array(f["X"]) if "X" in f else None
        obs = _read_dataframe(f["obs"]) if "obs" in f else None
        var = _read_dataframe(f["var"]) if "var" in f else None
        obsm = {}
        if "obsm" in f:
            for k in f["obsm"].keys():
                obsm[k] = _read_array(f["obsm"][k])
        layers = {}
        if "layers" in f:
            for k in f["layers"].keys():
                layers[k] = _read_array(f["layers"][k])
        uns = {}
        if "uns" in f:
            for k in f["uns"].keys():
                try:
                    uns[k] = _read_array(f["uns"][k])
                except ValueError:
                    pass  # skip exotic encodings we don't need
    return AnnData(X, obs=obs, var=var, obsm=obsm, layers=layers, uns=uns)


# ---------------------------------------------------------------------------
# h5ad writing
# ---------------------------------------------------------------------------

def _set_enc(node, enc_type, version="0.2.0"):
    node.attrs["encoding-type"] = enc_type
    node.attrs["encoding-version"] = version


_STR_DT = h5py.string_dtype(encoding="utf-8")


def _write_array(parent, key, value):
    if sp.issparse(value):
        value = value.tocsr()
        g = parent.create_group(key)
        _set_enc(g, "csr_matrix", "0.1.0")
        g.attrs["shape"] = np.array(value.shape, dtype=np.int64)
        g.create_dataset("data", data=value.data)
        g.create_dataset("indices", data=value.indices)
        g.create_dataset("indptr", data=value.indptr)
        return
    if isinstance(value, pd.Categorical):
        g = parent.create_group(key)
        _set_enc(g, "categorical", "0.2.0")
        g.attrs["ordered"] = False
        cats = np.asarray(value.categories)
        if cats.dtype.kind in ("O", "U", "S"):
            ds = g.create_dataset("categories", data=cats.astype(object), dtype=_STR_DT)
            _set_enc(ds, "string-array")
        else:
            ds = g.create_dataset("categories", data=cats)
            _set_enc(ds, "array")
        codes = g.create_dataset("codes", data=value.codes.astype(np.int64))
        _set_enc(codes, "array")
        return
    if isinstance(value, dict):
        g = parent.create_group(key)
        _set_enc(g, "dict", "0.1.0")
        for k, v in value.items():
            _write_array(g, str(k), v)
        return
    if isinstance(value, str):
        ds = parent.create_dataset(key, data=value, dtype=_STR_DT)
        _set_enc(ds, "string")
        return
    if np.isscalar(value):
        ds = parent.create_dataset(key, data=value)
        _set_enc(ds, "numeric-scalar")
        return
    arr = np.asarray(value)
    if arr.dtype.kind in ("O", "U", "S"):
        ds = parent.create_dataset(key, data=arr.astype(object), dtype=_STR_DT)
        _set_enc(ds, "string-array")
    else:
        ds = parent.create_dataset(key, data=arr)
        _set_enc(ds, "array")


def _write_dataframe(parent, key, df: pd.DataFrame, index_name="_index"):
    g = parent.create_group(key)
    _set_enc(g, "dataframe", "0.2.0")
    g.attrs["_index"] = index_name
    g.attrs["column-order"] = np.array(list(df.columns), dtype=object) if len(df.columns) else h5py.Empty(_STR_DT)
    _write_array(g, index_name, np.asarray(df.index.astype(str)))
    for col in df.columns:
        series = df[col]
        if isinstance(series.dtype, pd.CategoricalDtype):
            _write_array(g, str(col), series.values)
        elif series.dtype == object:
            _write_array(g, str(col), series.astype(str).to_numpy())
        else:
            _write_array(g, str(col), series.to_numpy())


def write_h5ad(path, adata: AnnData):
    with h5py.File(path, "w") as f:
        _set_enc(f, "anndata", "0.1.0")
        _write_array(f, "X", adata.X)
        _write_dataframe(f, "obs", adata.obs)
        _write_dataframe(f, "var", adata.var)
        obsm = f.create_group("obsm")
        _set_enc(obsm, "dict", "0.1.0")
        for k, v in adata.obsm.items():
            _write_array(obsm, k, np.asarray(v))
        varm = f.create_group("varm")
        _set_enc(varm, "dict", "0.1.0")
        for k, v in adata.varm.items():
            _write_array(varm, k, np.asarray(v))
        layers = f.create_group("layers")
        _set_enc(layers, "dict", "0.1.0")
        for k, v in adata.layers.items():
            _write_array(layers, k, v)
        uns = f.create_group("uns")
        _set_enc(uns, "dict", "0.1.0")
        for k, v in adata.uns.items():
            try:
                _write_array(uns, k, v)
            except TypeError:
                pass
