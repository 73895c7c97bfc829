"""Dump .explain("formatted") for named queries into plans/<tag>/.

    python tools/dump_plan.py r15 before minhash_calibration ann_sq8_topk
    python tools/dump_plan.py r15 after  minhash_calibration

Writes plans/<tag>/<query>_<stage>.txt at the repo root (the judge checks
plan claims against these files; guide section 7.2).
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    tag, stage, *names = sys.argv[1:]
    from pyspark.sql import SparkSession

    from quickstart_streaming_agents_spark.queries import QUERIES
    from quickstart_streaming_agents_spark.session import get_spark, ship_package

    spark = get_spark(f"dump-plan-{tag}")
    ship_package(spark)
    sf_dir = "/root/testdata/sf0.001"
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = out_dir / f"{name}_{stage}.txt"
        path.write_text(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
