"""Summarize the queued TPU session's results (docs/tpu_logs/*.log).

Each bench log ends in ONE JSON line (bench.py contract); microbench logs
are free-form. This prints a compact table of every JSON line found, plus
the tail of non-JSON logs, so a tunnel window can be harvested at a glance:

    python scripts/harvest_tpu_logs.py [logdir]

Decision guide — 2026-08-18b queue (see scripts/tpu_session.sh):
  bench_{ch,atlas,mouse}_r3final -> headline confirms at shipped defaults
                            (expect ~0.127 / ~1.64 / ~0.216 s/epoch)
  bench_*_mlp_default    -> speed side of the mlp_matmul_precision flip;
                            biggest expected effect at mouse (9,281 genes)
  mlp_quality            -> gate: flip mlp default to 'default' iff ARI
                            delta within ~0.005 of highest AND finite
                            (the bar the svgp 'high' flip cleared)
  bench_atlas_svgp_default -> svgp 1-pass speed probe; only pursue the
                            quality question if it beats 1.644 by >2%
  svgp_default_quality   -> gate for svgp 1-pass (watch finiteness FIRST —
                            'high' is the validated floor today)
  bench_mouse_compound   -> both candidates together at mouse scale

Harvested 2026-08-18a queue (decisions taken, docs/performance.md):
  svgp 'high' default flipped; staging flags stayed off; banding global
  criterion confirmed at both scales; TI=1024 left env-gated.
"""
import json
import os
import sys


def main(logdir="docs/tpu_logs"):
    if not os.path.isdir(logdir):
        print(f"no {logdir}/ yet — the tunnel window has not fired")
        return 1
    names = sorted(n for n in os.listdir(logdir) if n.endswith(".log"))
    if not names:
        print(f"{logdir}/ is empty — the tunnel window has not fired")
        return 1
    rows, freeform = [], []
    for name in names:
        path = os.path.join(logdir, name)
        last_json = None
        with open(path, errors="replace") as fh:
            lines = fh.readlines()
        for line in lines:
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    last_json = json.loads(line)
                except ValueError:
                    pass
        if last_json:
            rows.append((name, last_json))
        else:
            freeform.append((name, [l.rstrip() for l in lines[-12:]]))
    if rows:
        w = max(len(n) for n, _ in rows)
        print(f"{'log':<{w}}  {'value':>9}  {'vs_base':>8}  metric / extras")
        for name, j in rows:
            extras = {
                k: v for k, v in j.items()
                if k not in ("metric", "value", "unit", "vs_baseline",
                             "mfu_basis", "flops_per_epoch")
            }
            # a crashed bench can leave a parseable-but-partial line;
            # render missing fields instead of aborting the whole harvest
            val = j.get("value")
            vsb = j.get("vs_baseline")
            print(f"{name:<{w}}  "
                  f"{('?' if val is None else val):>9}  "
                  f"{('?' if vsb is None else vsb):>8}"
                  f"  {j.get('metric')} {extras}")
    for name, tail in freeform:
        print(f"\n--- {name} (tail) ---")
        print("\n".join(tail))
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
