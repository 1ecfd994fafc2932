#!/usr/bin/env python
"""Run-to-run stability sweep over every oracle-backed registry entry.

Floating-point aggregation order varies with partitioning and task
scheduling; an entry whose rounded output sits on a rounding boundary
will flip between driver runs and read as a wrong answer. This sweep
executes each entry three times under DIFFERENT shuffle-partition
settings (maximally perturbing summation order) and reports any entry
whose canonical output is not identical across all three, plus any
mismatch against the DuckDB oracle.

Usage: python tools/stability_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_ingestor_spark.queries import REGISTRY, _ensure_loaded
from parquet_ingestor_spark.session import get_spark
from parquet_ingestor_spark.testing import duck_canon, duck_connect, spark_canon


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    _ensure_loaded()
    spark = get_spark(
        app_name="stability-sweep",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)
    unstable, wrong, ok = [], [], 0
    names = [n for n, q in REGISTRY.items() if q.oracle]
    for name in names:
        q = REGISTRY[name]
        canons = set()
        for parts in ("8", "32", "5"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            canons.add(tuple(spark_canon(q.fn(spark, sf_dir))))
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        if len(canons) > 1:
            unstable.append(name)
            print(f"UNSTABLE {name}", flush=True)
            continue
        if list(canons)[0] != tuple(duck_canon(con, q.oracle)):
            wrong.append(name)
            print(f"MISMATCH {name}", flush=True)
            continue
        ok += 1
        print(f"ok {name}", flush=True)
    print(f"SWEEP DONE ok={ok} unstable={unstable} wrong={wrong}", flush=True)


if __name__ == "__main__":
    main()
