"""Checkpoint + resume for the full training state.

The reference can only `torch.save(state_dict)` at the end of training with
no load path anywhere (SpaDOT/train.py:39-41; SURVEY.md §5 "Checkpoint /
resume"). Here the COMPLETE state — params, BatchNorm stats, optimizer state,
per-timepoint KMeans centroids/assignments, transport plans, RNG key, and the
epoch counter — round-trips, so interrupted training resumes exactly.
"""
import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, state: dict):
    payload = {k: _to_host(v) if k != "meta" else v for k, v in state.items()}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
