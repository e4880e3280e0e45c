"""Per-op time decomposition of the steady-state training epoch.

Runs a few steady epochs under `jax.profiler.trace` at a bench scale
(BENCH_MODE, same synthetic shapes as bench.py), then parses the captured
XPlane protos with tensorboard_plugin_profile and prints the top ops by
self time — the precise version of the branch-ablation decomposition
(docs/tpu_logs/bench_*_only.log), attributing time to actual fusions /
convolutions / choleskys instead of whole branches.

Usage: python scripts/profile_epoch.py [epochs]
Env:   BENCH_MODE / BENCH_SPOTS / BENCH_GENES / BENCH_TPS as bench.py;
       PROFILE_DIR (default /tmp/spadot_profile_epoch).
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def top_ops_from_xspace(xspace_path, top=40):
    """Aggregate per-op time from an .xplane.pb capture, PER XLine.

    Device planes are '/device:TPU:0' etc.; each XLine is a separate event
    track (op executions, module spans, async DMA streams) and tracks
    OVERLAP each other in time — summing across lines triple-counts (a
    module span covers its ops; copy-start events span their whole async
    lifetime). Durations are picoseconds in the proto.

    Returns {plane_name: {line_name: {op_name: ps}}}.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(xspace_path, "rb") as f:
        xspace.ParseFromString(f.read())

    per_plane = {}
    for plane in xspace.planes:
        # TPU device planes are '/device:TPU:…' / '#Chip… TensorCore';
        # a CPU-backend capture puts op execution under '/host:CPU'.
        meta = plane.event_metadata
        lines = {}
        for line in plane.lines:
            agg = {}
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta else "?"
                agg[name] = agg.get(name, 0) + ev.duration_ps
            if agg:
                key = line.name or line.display_name or f"line_{line.id}"
                prev = lines.get(key)
                if prev:  # same-named lines (host threads): merge
                    for k, v in agg.items():
                        prev[k] = prev.get(k, 0) + v
                else:
                    lines[key] = agg
        if lines:
            per_plane[plane.name] = lines
    return per_plane


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    outdir = os.environ.get("PROFILE_DIR", "/tmp/spadot_profile_epoch")

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/spadot_jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import pandas as pd

    from spadot_tpu.config import default_config
    from spadot_tpu.data.pipeline import prepare_data
    from spadot_tpu.io import AnnData
    from spadot_tpu.train.loop import Trainer
    from spadot_tpu.utils.rng import set_seed

    mode = os.environ.get("BENCH_MODE", "chickenheart")
    if mode == "atlas":
        n_tp = int(os.environ.get("BENCH_TPS", 2))
        n_per_tp = int(os.environ.get("BENCH_SPOTS", 102400))
        n_genes = int(os.environ.get("BENCH_GENES", 2954))
    elif mode == "mouse":
        n_tp = int(os.environ.get("BENCH_TPS", 3))
        n_per_tp = int(os.environ.get("BENCH_SPOTS", 3400))
        n_genes = int(os.environ.get("BENCH_GENES", 9281))
    else:
        n_tp = int(os.environ.get("BENCH_TPS", 4))
        n_per_tp = int(os.environ.get("BENCH_SPOTS", 2500))
        n_genes = int(os.environ.get("BENCH_GENES", 2954))

    rng = np.random.default_rng(0)
    Xs, coords, tps = [], [], []
    for t in range(n_tp):
        xy = rng.uniform(0, 10, size=(n_per_tp, 2)).astype(np.float32)
        dom = (xy[:, 0] * 7 / 10).astype(int)
        means = rng.normal(0, 1.0, size=(8, n_genes)).astype(np.float32)
        Xs.append(means[dom] + rng.normal(
            0, 0.5, size=(n_per_tp, n_genes)).astype(np.float32))
        coords.append(xy)
        tps.extend([t] * n_per_tp)
    adata = AnnData(
        np.vstack(Xs).astype(np.float32),
        obs=pd.DataFrame({"timepoint": tps}),
        obsm={"spatial": np.vstack(coords)},
    )

    cfg = default_config()
    cfg.update(input_dim=n_genes, timepoints=list(range(n_tp)),
               # reference default (1200) at bench scale; keep tiny smoke
               # shapes valid
               inducing_point_nums=min(1200, n_tp * n_per_tp // 2))
    if os.environ.get("BENCH_CFG"):
        import json
        cfg.update(json.loads(os.environ["BENCH_CFG"]))
    if mode == "atlas":
        cfg.update(batch_size=4096, full_graph_gat=False, gat_window=2048)
    set_seed(int(cfg["seed"]))
    data = prepare_data(adata, cfg)
    trainer = Trainer(cfg, data)
    variables, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    km = {"centers": {}, "assign": {}}
    rng_key = jax.random.PRNGKey(1)
    fused = bool(getattr(trainer, "fused", False))
    assert fused, "profile_epoch expects the fused epoch (single device)"
    km["_stacked"] = trainer._km_stacked
    km["_have"] = False
    order = list(range(len(trainer.timepoints)))

    def one_epoch(variables, opt_state, rng_key, epoch):
        variables, opt_state, rng_key, _ = trainer.run_epoch_fused(
            variables, opt_state, rng_key, jax.random.PRNGKey(2 + epoch),
            order, km, epoch, 0.5,
        )
        return variables, opt_state, rng_key

    # warmup: compile + activate kmeans/ot paths
    for epoch in range(2):
        t0 = time.perf_counter()
        variables, opt_state, rng_key = one_epoch(variables, opt_state, rng_key, epoch)
        jax.block_until_ready(variables["params"])
        print(f"# warmup epoch {epoch}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    import shutil
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        t0 = time.perf_counter()
        for epoch in range(60, 60 + epochs):
            variables, opt_state, rng_key = one_epoch(
                variables, opt_state, rng_key, epoch)
        jax.block_until_ready(variables["params"])
        wall = time.perf_counter() - t0
    print(f"# traced {epochs} epochs: {wall/epochs:.4f} s/epoch")

    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("NO XPLANE CAPTURED (remote backend may not support device "
              "tracing) — trace dir contents:", os.listdir(outdir))
        return
    per_plane = top_ops_from_xspace(paths[-1])
    if not per_plane:
        print("xplane parsed but contained no device planes (host-only "
              "capture); file:", paths[-1])
        return
    for plane, lines in per_plane.items():
        print(f"\n=== {plane} — per-line totals (lines OVERLAP; do not sum "
              f"across lines) ===")
        for lname, agg in sorted(
            lines.items(), key=lambda kv: -sum(kv[1].values())
        ):
            total_ps = sum(agg.values())
            print(f"  line '{lname}': {total_ps/1e12/epochs:.4f} s/epoch "
                  f"({len(agg)} distinct events)")
        # full table for the op-level line only: 'XLA Ops' on TPU; on a
        # host/CPU capture fall back to the busiest line
        op_line = None
        for cand in ("XLA Ops", "XLA Ops (GPU)", "Ops"):
            if cand in lines:
                op_line = cand
                break
        if op_line is None:
            op_line = max(lines, key=lambda k: sum(lines[k].values()))
        agg = lines[op_line]
        total_ps = sum(agg.values())
        print(f"  --- top ops on line '{op_line}' "
              f"({total_ps/1e12/epochs:.4f} s/epoch busy) ---")
        rows = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
        for name, ps in rows:
            print(f"{ps/1e12/epochs*1e3:9.3f} ms/ep  {100*ps/total_ps:5.1f}%  "
                  f"{name[:110]}")


if __name__ == "__main__":
    main()
