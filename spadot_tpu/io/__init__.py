from spadot_tpu.io.anndata_lite import AnnData, concat, read_h5ad, write_h5ad

__all__ = ["AnnData", "concat", "read_h5ad", "write_h5ad"]
