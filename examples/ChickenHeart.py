"""The reference ChickenHeart tutorial, Namespace-args style.

Mirrors /root/reference/examples/ChickenHeart.ipynb cell for cell: the same
three `Namespace` objects drive `spadot_tpu.preprocess / train / analyze`
exactly as `SpaDOT.preprocess / train / analyze` do in the notebook (the
package API accepts plain argparse namespaces — SpaDOT/__init__.py:1-5).

Point --data at the published ChickenHeart.h5ad to reproduce the tutorial;
without it, this file is documentation of the API shape (examples/golden_run.py
is the runnable end-to-end on synthetic data).

Usage: python examples/ChickenHeart.py [path/to/ChickenHeart.h5ad] [out_dir]
"""
import os
import sys
from argparse import Namespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import spadot_tpu

data_path = sys.argv[1] if len(sys.argv) > 1 else "./ChickenHeart.h5ad"
result_dir = sys.argv[2] if len(sys.argv) > 2 else "./ChickenHeart_output"
os.makedirs(result_dir, exist_ok=True)

# --- 1. preprocess: SCTransform + SPARK-X SVG selection + normalization
preprocess_args = Namespace(
    data=data_path,
    prefix="preprocessed_",
    feature_selection=True,
    output_dir=result_dir,
)
spadot_tpu.preprocess(preprocess_args)

# --- 2. train: dual SVGP+GAT VAE with KMeans + OT coupling losses
train_args = Namespace(
    data=result_dir + os.sep + "preprocessed_" + os.path.basename(data_path),
    output_dir=result_dir,
    prefix="",
    config=None,        # default configuration (spadot_tpu/config.yaml)
    save_model=True,
    device="tpu",       # or "cpu"
)
spadot_tpu.train(train_args)

# --- 3a. analyze with fixed per-timepoint cluster counts
analyze_args = Namespace(
    data=result_dir + os.sep + "latent.h5ad",
    prefix="",
    output_dir=result_dir,
    n_clusters=[5, 7, 7, 6],
)
spadot_tpu.analyze(analyze_args)

# --- 3b. analyze again with adaptive (WSS-elbow) cluster selection
analyze_args = Namespace(
    data=result_dir + os.sep + "latent.h5ad",
    prefix="adaptive_",
    output_dir=result_dir,
    n_clusters=None,
)
spadot_tpu.analyze(analyze_args)
