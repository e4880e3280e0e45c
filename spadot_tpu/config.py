"""Config system: single YAML with the reference's exact key set.

Reference: SpaDOT/utils/_utils.py:38-50 (load_model_config) and
SpaDOT/config.yaml:1-57 (key inventory). We additionally deep-merge user
configs over the packaged defaults so partial configs are valid, and expose a
few TPU-native keys (dtype, mesh_shape, use_pallas) with safe defaults.
"""
import copy
import os

import yaml

_DEFAULT_CONFIG_PATH = os.path.join(os.path.dirname(__file__), "config.yaml")
_default_cache = None


def default_config() -> dict:
    """Load the packaged default configuration (deep copy)."""
    global _default_cache
    if _default_cache is None:
        with open(_DEFAULT_CONFIG_PATH, "r") as f:
            _default_cache = yaml.safe_load(f)
    return copy.deepcopy(_default_cache)


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_model_config(args) -> dict:
    """Load config: the packaged default, overlaid with ``args.config`` if given."""
    config = default_config()
    user_path = getattr(args, "config", None)
    if user_path:
        with open(user_path, "r") as f:
            user = yaml.safe_load(f) or {}
        config = _deep_merge(config, user)
    return config


def resolve_dtype(config: dict):
    """Map the config dtype string to a jnp dtype; enables x64 when requested."""
    import jax
    import jax.numpy as jnp

    name = str(config.get("dtype", "float32")).lower()
    if name in ("float64", "f64", "double"):
        jax.config.update("jax_enable_x64", True)
        return jnp.float64
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    return jnp.float32
