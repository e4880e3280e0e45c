"""spadot_tpu — a TPU-native (JAX/XLA/Pallas) framework for spatiotemporal
transcriptomics: spatial-domain identification per timepoint and optimal-transport
domain-transition inference across timepoints.

Ground-up JAX re-design with the capability surface of the reference SpaDOT
package (see /root/reference; SURVEY.md for the full inventory):

- ``preprocess``: SCTransform-style regularized NB normalization (vmapped
  quasi-Poisson Newton fits), SPARK-X spatially-variable-gene selection
  (closed-form quadratic-form score tests batched over genes on the MXU),
  Louvain SVG clustering, per-timepoint normalize/log1p/scale.
- ``train``: dual-encoder VAE — a Sparse Variational GP branch over spatial
  coordinates (batched Cholesky solves vmapped over latent dims) and a graph
  attention branch over the spatial k-NN graph (padded-neighbor masked
  attention; Pallas fused kernel) — with KMeans clustering loss and an
  unbalanced entropic optimal-transport coupling loss between adjacent
  timepoints (log-domain Sinkhorn engine).
- ``analyze``: KMeans / adaptive elbow domain clustering, full-cell transport
  maps + transition tables (replaces the external ``wot`` dependency with the
  same Sinkhorn engine), domain/dotplot figures.

External contract matches the reference: the 3-subcommand CLI over AnnData
h5ad files, the YAML config key set, and all output artifact filenames.
Reference entry points: SpaDOT/__init__.py:1-5, SpaDOT/cli.py:76-97.
"""

__version__ = "0.1.0"

from spadot_tpu.preprocess.core import preprocess
from spadot_tpu.train.loop import train
from spadot_tpu.analyze.core import analyze

__all__ = ["preprocess", "train", "analyze", "__version__"]
