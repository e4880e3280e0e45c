"""Collective accounting for the sharded fused epoch (VERDICT r2 missing #3).

The multi-chip claim needs evidence beyond "it compiles and matches":
this script lowers the FUSED whole-epoch dispatch (every timepoint's gated
batch scan + the KMeans refresh) over an 8-device `data` mesh, then walks
the post-SPMD optimized HLO and tabulates every collective XLA inserted —
kind, static op count, result bytes — plus the module-level op census.
Nothing here is hand-written communication (docs/scaling.md): the table IS
the communication schedule GSPMD derived from the `NamedSharding`
annotations in parallel/mesh.py.

Run (no TPU needed — the partitioning is platform-independent):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/collective_accounting.py [n_devices]

Numbers recorded in docs/scaling.md. Static counts: a collective inside
the batch `lax.scan` / KMeans `fori` body appears ONCE in the HLO but
executes once per loop iteration; the table reports the loop context so
the dynamic count is (static count x trip count).
"""
import os
import re
import sys

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={N_DEV} "
    + os.environ.get("XLA_FLAGS", "")
)
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all", "collective-broadcast",
)
_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "s32": 4, "u64": 8,
    "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}
# `%name = f32[8,16]{1,0} all-reduce(` — also matches tuple-free forms
_OP_RE = re.compile(
    r"=\s+(?:\()?([a-z0-9]+)\[([\d,]*)\][^\s]*\s*(?:\))?\s*"
    r"(" + "|".join(COLLECTIVES) + r")\("
)


def _bytes(dtype, dims):
    n = 1
    for d in dims.split(",") if dims else []:
        n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def account(hlo_text):
    """-> (per-kind {kind: [count, bytes]}, rows, op census)."""
    per_kind, rows = {}, []
    census = {}
    context = "entry"
    for line in hlo_text.splitlines():
        stripped = line.strip()
        # computation headers tell us whether we're inside a loop body
        if stripped.startswith(("%", "ENTRY")) and "{" in stripped and "= " not in stripped:
            name = stripped.split()[0].lstrip("%")
            if "while" in name or "body" in name:
                context = "loop-body"
            elif "cond" in name:
                context = "loop-cond"
            else:
                context = name[:40]
        m = _OP_RE.search(line)
        if m:
            dtype, dims, kind = m.groups()
            b = _bytes(dtype, dims)
            agg = per_kind.setdefault(kind, [0, 0])
            agg[0] += 1
            agg[1] += b
            rows.append((kind, f"{dtype}[{dims}]", b, context))
        m2 = re.search(r"=\s+(?:\()?[a-z0-9]+\[[^\]]*\][^\s]*\s*(?:\))?\s*([a-z-]+)\(", line)
        if m2:
            census[m2.group(1)] = census.get(m2.group(1), 0) + 1
    return per_kind, rows, census


def main():
    from __graft_entry__ import _tiny_setup
    from spadot_tpu.parallel.mesh import make_mesh
    from spadot_tpu.train.loop import Trainer

    devices = jax.devices()[:N_DEV]
    assert len(devices) == N_DEV, (len(devices), N_DEV)
    adata, cfg, data = _tiny_setup(n=8 * max(8, N_DEV), g=24)
    mesh = make_mesh({"data": N_DEV}, devices=devices)
    trainer = Trainer(cfg, data, mesh=mesh)
    assert trainer.fused, "fused stacked-timepoint epoch must be on"
    variables, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    km = {"centers": {}, "assign": {},
          "_stacked": trainer._km_stacked, "_have": False}

    captured = {}
    real = trainer._fused_jit

    def capture(*a):
        captured["args"] = a
        return real(*a)

    trainer._fused_jit = capture
    order = list(range(len(trainer.timepoints)))
    trainer.run_epoch_fused(
        variables, opt_state, jax.random.PRNGKey(1), jax.random.PRNGKey(2),
        order, km, epoch=1, beta1=0.5,
    )
    trainer._fused_jit = real
    compiled = real.lower(*captured["args"]).compile()
    hlo = compiled.as_text()
    per_kind, rows, census = account(hlo)

    n_batches = trainer.tp_batches[trainer.timepoints[0]][0].shape[0]
    print(f"fused epoch over {N_DEV} virtual devices "
          f"(T={len(trainer.timepoints)}, {n_batches} batches/tp, "
          f"ONE dispatch/epoch)")
    print(f"HLO ops total: {sum(census.values())}; module bytes "
          f"~{len(hlo) // 1024} KiB of text")
    if not per_kind:
        print("NO collectives in the fused epoch module.")
    print(f"\n{'collective':22s} {'static ops':>10s} {'result bytes':>13s}")
    for kind, (cnt, b) in sorted(per_kind.items()):
        print(f"{kind:22s} {cnt:10d} {b:13d}")
    print("\nlargest collective results (top 10):")
    for kind, shape, b, ctx in sorted(rows, key=lambda r: -r[2])[:10]:
        print(f"  {kind:20s} {shape:24s} {b:10d} B  in {ctx}")
    incidental = {k: v for k, v in census.items() if k in (
        "dynamic-slice", "dynamic-update-slice", "gather", "scatter")}
    print(f"\nloop/gather census (context): {incidental}")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"per-device memory: args {mem.argument_size_in_bytes >> 10} KiB, "
              f"output {mem.output_size_in_bytes >> 10} KiB, "
              f"temp {mem.temp_size_in_bytes >> 10} KiB")


if __name__ == "__main__":
    main()
