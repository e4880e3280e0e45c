"""Seeding and RNG-key threading.

Replaces the reference's global seeding story (SpaDOT/utils/_utils.py:22-36:
torch/cuda/numpy/random seeds + cudnn determinism) with numpy/python seeding
for host-side work plus explicit `jax.random` key threading for device work —
JAX programs are deterministic given the key, so no backend flags are needed.
"""
import os
import random

import numpy as np


def set_seed(seed: int = 1993):
    """Seed host-side RNGs (numpy / python / hash)."""
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    random.seed(seed)


def make_key(seed: int = 1993):
    import jax

    return jax.random.PRNGKey(seed)


def enable_compilation_cache(cache_dir=None):
    """Persistent XLA compilation cache (big win for remote-TPU compiles)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/spadot_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
