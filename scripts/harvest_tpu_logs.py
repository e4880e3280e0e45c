"""Summarize the queued TPU session's results (docs/tpu_logs/*.log).

Each bench log ends in ONE JSON line (bench.py contract); microbench logs
are free-form. This prints a compact table of every JSON line found, plus
the tail of non-JSON logs, so a tunnel window can be harvested at a glance:

    python scripts/harvest_tpu_logs.py [logdir]

Decision guide (what each A/B decides; see scripts/tpu_session.sh):
  bench_atlas_nobf16     -> if faster than bench_atlas, flip gat_bf16_gather default off
  bench_atlas_pregather  -> if faster, flip gat_ext_pregather default on (atlas band)
  bench_atlas_stream     -> if faster still, also flip batch_rows_stream on
  bench_atlas_nobanded   -> if faster, banded closures lose at atlas scale
  bench_ch_banded        -> if faster than bench_ch, banding wins even at P~1280
  bench_ch_svgp_high     -> if faster at equal quality, svgp 'high' precision default
  flash3_ti1024          -> if faster than banded.log's 8192 row, TI=1024 default
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
