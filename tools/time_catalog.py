"""Time every CATALOG entry at a given SF with the noop sink (guide §1.4).

Measurement tooling for the optimization rounds: ranks the full catalog
by wall-clock so optimization effort lands on the actual heavy hitters,
not just the 12 bench headliners. Streaming/sink entries that cannot
batch-execute are skipped (reported as such).

Usage:
  python tools/time_catalog.py [--sf DIR] [-n RUNS] [-q NAME ...] [-o OUT.json]

Output: one JSON object {name: best_sec, ...} sorted descending, plus a
"_meta" block (sf, n, load, calibration) — same calibration query as
bench.py so numbers are tide-comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-n", "--runs", type=int, default=1)
    ap.add_argument("-q", "--queries", nargs="*", default=None)
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tada_spark.queries import CATALOG
    from tada_spark.session import get_spark

    spark = get_spark("tada_spark_time_catalog")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()  # warm JVM + footers

    load_start = os.getloadavg()[0]
    calib = float("inf")
    for _ in range(3):
        t0 = time.time()
        spark.range(50_000_000).agg(F.sum("id")).write.format("noop").mode("overwrite").save()
        calib = min(calib, time.time() - t0)

    names = args.queries or list(CATALOG)
    times: dict[str, float] = {}
    skipped: list[str] = []
    for name in names:
        fn = CATALOG[name][0]
        spark.sparkContext.setJobDescription(f"time_catalog: {name}")
        best = float("inf")
        try:
            for _ in range(args.runs):
                t0 = time.time()
                df = fn(spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
        except Exception as e:
            skipped.append(name)
            print(f"{name}: SKIP ({type(e).__name__})", file=sys.stderr)
            continue
        finally:
            spark.sparkContext.setJobDescription(None)
        times[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", file=sys.stderr)

    out = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    out["_meta"] = {
        "sf": args.sf,
        "n": args.runs,
        "load_1m_start": round(load_start, 2),
        "load_1m_end": round(os.getloadavg()[0], 2),
        "calibration_sec": round(calib, 3),
        "skipped": skipped,
        "total_sec": round(sum(times.values()), 3),
    }
    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)
    spark.stop()


if __name__ == "__main__":
    main()
