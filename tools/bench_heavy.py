"""Heavy-tier scaling bench (VERDICT r14 next-round #1).

Times bench.HEAVY_TIER (the ~18 queries >=~3 s at sf0.1) against the
deterministic heavy fixtures from tools/gen_heavy_sf.py, with exactly the
sf0.1 bench methodology (fresh session, table warmup, noop sink, min-of-2,
cache + tracked-broadcast release between queries), at the core count in
$SPARK_GRAFT_CPUS. Run it twice (32 and 8 cores) to get the low/high-core
ratios that sf0.1 cannot produce; results go to --out (committed as
BENCH_HEAVY_r15.json with both core counts merged).

Usage:
  SPARK_GRAFT_CPUS=32 python tools/bench_heavy.py --out /tmp/heavy_c32.json
  SPARK_GRAFT_CPUS=8  python tools/bench_heavy.py --out /tmp/heavy_c8.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.environ.get(
        "SPARK_GRAFT_HEAVY_DIR", "/tmp/qssa_heavy_sf1"))
    ap.add_argument("--out", default="")
    ap.add_argument("--queries", default="",
                    help="comma-separated subset (default: HEAVY_TIER)")
    a = ap.parse_args()

    if not os.path.isdir(a.dir):
        print(f"generating heavy fixtures into {a.dir} ...", flush=True)
        from tools.gen_heavy_sf import generate
        generate("/root/testdata/sf0.1", a.dir, 10)

    from bench import HEAVY_TIER, _run_chunk_inprocess

    names = a.queries.split(",") if a.queries else HEAVY_TIER
    os.environ["SPARK_GRAFT_SF_DIR"] = a.dir
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    t0 = time.monotonic()
    load0 = os.getloadavg()[0]

    results: dict = {
        "metric": "heavy_tier_total_runtime",
        "unit": "sec",
        "dir": a.dir,
        "cpus": cpus,
        "queries": {},
    }

    def report(name, sec, err):
        if sec is not None:
            results["queries"][name] = sec
        else:
            results.setdefault("errors", {})[name] = err
        results["value"] = round(sum(results["queries"].values()), 3)
        results["elapsed_s"] = round(time.monotonic() - t0, 1)
        results["load_avg_1m"] = {
            "start": round(load0, 2),
            "end": round(os.getloadavg()[1 - 1], 2),
        }
        line = json.dumps(results, separators=(",", ":"))
        print(line, flush=True)
        if a.out:
            Path(a.out).write_text(json.dumps(results, indent=1) + "\n")

    _run_chunk_inprocess(names, on_query=report)


if __name__ == "__main__":
    main()
