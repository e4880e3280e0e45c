"""Checkpoint + resume for the full training state — safe npz format.

The reference can only `torch.save(state_dict)` at the end of training with
no load path anywhere (SpaDOT/train.py:39-41; SURVEY.md §5 "Checkpoint /
resume"). Here the COMPLETE state — params, BatchNorm stats, optimizer state,
per-timepoint KMeans centroids/assignments, transport plans, RNG key, the
host python RNG (timepoint shuffle) and the epoch counter — round-trips, so
interrupted training resumes exactly.

Format: one .npz (zip of raw arrays, versioned, no pickled objects — loading
a checkpoint can never execute code). Pytree *structure* (optax namedtuples
etc.) is NOT stored; on load the caller rebuilds a freshly-initialized
(variables, opt_state) of the same config and the flat arrays are poured back
in with `flax.serialization.from_state_dict` (see restore_model_state).
"""
import os

import jax
import numpy as np
from jax.numpy import bfloat16 as _BF16

CKPT_VERSION = 2
_SEP = "/"


def _flatten(prefix, node, out):
    if isinstance(node, dict):
        if not node:
            # preserve empty subtrees (e.g. optax EmptyState) so the restored
            # state dict has the same list/tuple arity as the live structure
            out[f"{prefix}{_SEP}__empty__" if prefix else "__empty__"] = (
                np.asarray(0)
            )
            return
        for k, v in node.items():
            key = str(k)
            assert _SEP not in key, f"checkpoint key may not contain '/': {key!r}"
            _flatten(f"{prefix}{_SEP}{key}" if prefix else key, v, out)
    else:
        arr = np.asarray(node)
        if arr.dtype == _BF16:
            # npz round-trips bfloat16 as raw void bytes; store the uint16
            # bit pattern under a tagged key and view it back on load
            out[prefix + "::bf16"] = arr.view(np.uint16)
        else:
            out[prefix] = arr


def _unflatten(flat):
    tree = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts[-1] == "__empty__":
            continue  # marker: the enclosing dict exists but is empty
        if parts[-1].endswith("::bf16"):
            node[parts[-1][: -len("::bf16")]] = val.view(_BF16)
        else:
            node[parts[-1]] = val
    return tree


def save_checkpoint(path, state: dict):
    """state: variables, opt_state, kmeans_centers, kmeans_assign, gammas,
    rng, loss_rows, meta={epoch, py_random_state}."""
    from flax import serialization

    flat = {"__ckpt_version__": np.asarray(CKPT_VERSION)}
    model_sd = serialization.to_state_dict(
        {
            "variables": jax.tree_util.tree_map(np.asarray, state["variables"]),
            "opt_state": jax.tree_util.tree_map(np.asarray, state["opt_state"]),
        }
    )
    _flatten("model", model_sd, flat)
    for name in ("kmeans_centers", "kmeans_assign", "gammas"):
        for k, v in state.get(name, {}).items():
            flat[f"{name}{_SEP}{k}"] = np.asarray(v)
    flat["rng"] = np.asarray(state["rng"])
    rows = state.get("loss_rows", [])
    flat["loss_rows"] = (
        np.stack([np.asarray(r, np.float64) for r in rows])
        if rows else np.zeros((0, 7))
    )
    meta = state["meta"]
    flat["meta_epoch"] = np.asarray(int(meta["epoch"]))
    pyrs = meta.get("py_random_state")
    if pyrs is not None:
        version, mt_state, gauss = pyrs
        flat["pyrng_version"] = np.asarray(int(version))
        flat["pyrng_state"] = np.asarray(mt_state, np.uint64)
        flat["pyrng_gauss"] = np.asarray(
            np.nan if gauss is None else float(gauss)
        )

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_checkpoint(path) -> dict:
    """Load into the same dict layout save_checkpoint accepts, except
    variables/opt_state come back as ONE nested state dict under key
    "model_state" — pour it into live structures with restore_model_state."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    version = int(flat.pop("__ckpt_version__", 0))
    if version != CKPT_VERSION:
        raise ValueError(
            f"unsupported checkpoint version {version} in {path} "
            f"(expected {CKPT_VERSION}; legacy pickle checkpoints are not "
            f"loadable — retrain or re-save)"
        )
    state = {"kmeans_centers": {}, "kmeans_assign": {}, "gammas": {}}
    model_flat = {}
    for key, val in flat.items():
        head, _, rest = key.partition(_SEP)
        if head == "model":
            model_flat[rest] = val
        elif head in ("kmeans_centers", "kmeans_assign", "gammas"):
            state[head][rest] = val
    state["model_state"] = _unflatten(model_flat)
    state["rng"] = flat["rng"]
    state["loss_rows"] = [r for r in flat["loss_rows"]]
    pyrs = None
    if "pyrng_state" in flat:
        gauss = float(flat["pyrng_gauss"])
        pyrs = (
            int(flat["pyrng_version"]),
            tuple(int(x) for x in flat["pyrng_state"]),
            None if np.isnan(gauss) else gauss,
        )
    state["meta"] = {"epoch": int(flat["meta_epoch"]), "py_random_state": pyrs}
    return state


def restore_model_state(variables, opt_state, model_state):
    """Pour checkpointed arrays back into freshly-initialized structures
    (same config => same pytree structure; flax matches by path)."""
    from flax import serialization

    restored = serialization.from_state_dict(
        {"variables": variables, "opt_state": opt_state}, model_state
    )
    return restored["variables"], restored["opt_state"]
