"""Device mesh + sharding helpers.

The reference is strictly single-device (SpaDOT/cli.py:48-49; SURVEY.md §2.4).
The TPU-native scaling dimension is the number of spots: spot-major arrays
(expression, coords, neighbor lists, latents) are sharded along the first
axis over a 1-D `data` mesh axis; model parameters, inducing-point state and
the k×k OT plans are replicated. XLA inserts the all-gathers for the
neighbor-index gathers and psums for the batch reductions — collectives ride
ICI, never host memory.
"""
import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape=None, devices=None):
    """Build a Mesh. mesh_shape: dict like {'data': 8} or None for all devices
    on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if mesh_shape:
        axes = list(mesh_shape.keys())
        sizes = [int(mesh_shape[a]) for a in axes]
        dev_arr = np.asarray(devices[: int(np.prod(sizes))]).reshape(sizes)
        return Mesh(dev_arr, axes)
    return Mesh(np.asarray(devices), ("data",))


def spot_sharding(mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _pad_rows(arr, multiple):
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    pad_width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(np.asarray(arr), pad_width)


def shard_tp_data(dev, mesh):
    """Place per-timepoint arrays with spot-axis sharding (rows padded to a
    multiple of the mesh size; padded rows are never indexed by batch tables)."""
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    sharded = {}
    s_spot = spot_sharding(mesh)
    s_rep = replicated(mesh)
    n = np.asarray(dev["Y"]).shape[0]
    for k, v in dev.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and k in (
            "Y", "Y_gat", "coords", "nbr", "nbr_mask",
            "rev_src", "rev_slot", "rev_mask",
        ):
            arr = _pad_rows(np.asarray(v), n_dev)
            if k == "nbr" and arr.shape[0] > n:
                # padded rows get a self-loop sentinel: an all-masked GAT
                # softmax row is NaN and its backward leaks NaN·0 cotangents
                # into the weight gradients
                arr = arr.copy()
                arr[n:, 0] = np.arange(n, arr.shape[0])
            if k == "nbr_mask" and arr.shape[0] > n:
                arr = arr.copy()
                arr[n:, 0] = 1.0
            sharded[k] = jax.device_put(arr, s_spot)
        else:
            sharded[k] = jax.device_put(np.asarray(v), s_rep)
    return sharded
