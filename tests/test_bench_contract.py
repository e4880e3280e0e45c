"""The driver-bench fail-fast contract (round-3 verdict, Next #2).

BENCH_r03.json was rc=124: a dead TPU tunnel blocked `bench.py` inside
device init for the driver's whole 10-minute timeout, so the round's
headline had no driver-verifiable record. The contract now is: a dead
backend produces ONE parseable JSON line with an "error" key and a fast
exit — never a silent hang. These tests simulate the dead backend with an
env-forced probe command (no TPU required, no jax import in the child
beyond the probe)."""
import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(env_extra, timeout=60):
    env = dict(os.environ)
    env.update(env_extra)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    return proc, time.perf_counter() - t0


def test_dead_tunnel_fails_fast_with_parseable_json():
    """Probe command that hangs past its timeout -> error JSON + exit 3
    well inside the driver's window (simulated: 2 s probe timeout)."""
    proc, wall = _run_bench({
        "SPADOT_BENCH_PROBE_CMD": "sleep 600",
        "SPADOT_BENCH_PROBE_TIMEOUT": "2",
    })
    assert proc.returncode == 3, proc.stderr[-2000:]
    assert wall < 30
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["error"] == "tpu_unreachable"
    assert rec["metric"] == "chickenheart_scale_epoch_time"
    assert rec["value"] is None


def test_dead_tunnel_probe_nonzero_exit():
    """Probe command that exits nonzero (tunnel refused) -> same record;
    BENCH_MODE is reflected in the metric name so a partial queue log
    still says which arm died."""
    proc, wall = _run_bench({
        "SPADOT_BENCH_PROBE_CMD": "exit 7",
        "BENCH_MODE": "mouse",
    })
    assert proc.returncode == 3
    assert wall < 30
    rec = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][0]
    )
    assert rec == {
        "metric": "mouse_scale_epoch_time", "value": None,
        "unit": "s/epoch", "vs_baseline": None, "error": "tpu_unreachable",
    }


def test_scale_spec_parsing():
    """BENCH_SCALES parsing: aliases, whitespace, and typo-raising (the
    driver must never silently bench the wrong scale)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)
    assert bench_mod._scale_modes("ch,mouse,atlas") == [
        "chickenheart", "mouse", "atlas"]
    assert bench_mod._scale_modes(" CH , Atlas ") == ["chickenheart", "atlas"]
    with pytest.raises(ValueError, match="unknown scale"):
        bench_mod._scale_modes("ch,bogus")
    with pytest.raises(ValueError, match="no scales"):
        bench_mod._scale_modes(" , ")


def test_scales_dead_tunnel_single_error_line():
    """Multi-scale mode probes ONCE up front: a dead tunnel yields one
    error JSON + exit 3, not one per scale."""
    proc, wall = _run_bench({
        "BENCH_SCALES": "ch,mouse,atlas",
        "SPADOT_BENCH_PROBE_CMD": "exit 7",
    })
    assert proc.returncode == 3, proc.stderr[-2000:]
    assert wall < 30
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1
    assert json.loads(lines[0])["error"] == "tpu_unreachable"


def test_scales_unknown_scale_exits_2():
    proc, wall = _run_bench({
        "BENCH_SCALES": "ch,bogus",
        "SPADOT_BENCH_PROBE_CMD": "true",
    })
    assert proc.returncode == 2
    assert "unknown scale" in proc.stderr


@pytest.mark.slow  # e2e: two tiny CPU-forced scale runs back to back
def test_scales_emits_one_record_per_scale():
    """BENCH_SCALES=ch,mouse with tiny CPU shapes -> two parseable JSON
    lines with the per-scale metric names, exit 0."""
    proc, _ = _run_bench({
        "BENCH_SCALES": "ch,mouse",
        "SPADOT_BENCH_PROBE_CMD": "true",
        "BENCH_SPOTS": "64", "BENCH_GENES": "48", "BENCH_EPOCHS": "1",
        "BENCH_TPS": "2", "BENCH_INDUCING": "16",
        "SPADOT_BENCH_CPU": "1",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    }, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-3000:]
    recs = [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]
    assert [r["metric"] for r in recs] == [
        "chickenheart_scale_epoch_time", "mouse_scale_epoch_time"]
    assert all("error" not in r and r["value"] > 0 for r in recs)


@pytest.mark.slow  # fast-lane hygiene: e2e pass-through; the fail-fast contract tests stay in-lane
def test_probe_pass_proceeds_into_main():
    """A healthy probe must NOT short-circuit the bench: with the probe
    forced to succeed instantly and a tiny CPU-forced workload, bench.py
    runs to completion and prints the normal record."""
    proc, _ = _run_bench({
        "SPADOT_BENCH_PROBE_CMD": "true",
        # tiny shapes so the CPU run finishes quickly
        "BENCH_SPOTS": "64", "BENCH_GENES": "48", "BENCH_EPOCHS": "1",
        "BENCH_TPS": "2", "BENCH_INDUCING": "16",
        "SPADOT_BENCH_CPU": "1",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    }, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    rec = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert "error" not in rec
    assert rec["value"] is not None and rec["value"] > 0
