"""Figures: per-timepoint domain scatter plots and transition-probability
dotplots (parity with SpaDOT/utils/_analyze_utils.py:140-209).

NOTE: the matplotlib bodies here (figsize formula, grey-below-0.2 rule,
s = value*500 dot sizing, colorbar calls) deliberately TRANSCRIBE the
reference's plotting code — pixel-level parity of the PNG artifacts is a
stated contract goal and there is essentially one way to express it. This
is the one module where fidelity beats re-design; everything upstream of
the figures is original."""
import os

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import seaborn as sns

from spadot_tpu.io import read_h5ad


def plot_domains(args, adata):
    """Seaborn scatter of spatial domains per timepoint (_analyze_utils.py:140-164)."""
    for tp in sorted(adata.obs["timepoint"].unique().tolist()):
        rows = (adata.obs["timepoint"] == tp).to_numpy()
        obs = adata.obs.loc[rows].copy()
        spatial = np.asarray(adata.obsm["spatial"])[rows]
        obs["pixel_x"] = spatial[:, 0]
        obs["pixel_y"] = spatial[:, 1]
        plt.figure(figsize=(5, 5))
        sns.scatterplot(data=obs, x="pixel_x", y="pixel_y", hue="kmeans", palette="tab10", s=10)
        plt.legend(bbox_to_anchor=(1.05, 1), loc=2, borderaxespad=0.0)
        plt.title("Time point: {}".format(tp))
        plt.tight_layout()
        plt.savefig(args.output_dir + os.sep + args.prefix + str(tp) + "_domains.png")
        plt.close()


def plot_ot(args, adata):
    """Transition dotplots: min(row-normalized, col-normalized) transition
    probability, grey below 0.2, dot size ∝ value×500, Reds colormap
    (_analyze_utils.py:166-209)."""
    days = np.sort(adata.obs["day"].unique())
    for tp_i in range(len(days) - 1):
        prev_day, next_day = days[tp_i], days[tp_i + 1]
        tt = read_h5ad(
            args.output_dir + os.sep + args.prefix
            + f"transition_table_{prev_day}_{next_day}.h5ad"
        )
        X = tt.toarray().astype(np.float64)
        # zero-sum guard: an empty row/column (degenerate table) plots as
        # zero-probability dots instead of propagating NaN into the figure
        with np.errstate(divide="ignore", invalid="ignore"):
            col_norm = X / X.sum(axis=0, keepdims=True)
            row_norm = X / X.sum(axis=1, keepdims=True)
        prob_min = np.nan_to_num(np.minimum(col_norm, row_norm))
        plt.figure(figsize=(prob_min.shape[1] * 0.8, prob_min.shape[0] * 0.8))
        for i in range(prob_min.shape[0]):
            for j in range(prob_min.shape[1]):
                value = prob_min[i, j]
                color = "grey" if value < 0.2 else plt.cm.Reds(value)
                plt.scatter(j, i, s=value * 500, c=[color], edgecolors="black", alpha=0.8)
        plt.xticks(range(prob_min.shape[1]), tt.var_names, rotation=45, ha="right")
        plt.yticks(range(prob_min.shape[0]), tt.obs_names)
        plt.xlabel("{} Domains".format(next_day))
        plt.ylabel("{} Domains".format(prev_day))
        plt.title("Transition Probability Dotplot")
        plt.colorbar(
            plt.cm.ScalarMappable(cmap="Reds"), label="Transition Probability", ax=plt.gca()
        )
        plt.tight_layout()
        plt.savefig(
            args.output_dir + os.sep + args.prefix
            + f"transition_dotplot_{prev_day}_{next_day}.png"
        )
        plt.close()
