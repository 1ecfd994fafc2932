#!/usr/bin/env python
"""Run any registered query/operator by name from the command line.

    python tools/run_query.py <name> [--sf DIR] [--show N]
                              [--explain] [--oracle]

- ``--sf``       testdata dir (default /root/testdata/sf0.001)
- ``--show N``   print the first N rows (default 20)
- ``--explain``  print the formatted physical plan instead of rows
- ``--oracle``   also run the entry's DuckDB oracle (if it has one)
                 and report whether the canonical results match

``python tools/run_query.py --list [pattern]`` prints the inventory
(name + one-line doc), optionally filtered by a substring.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_ingestor_spark.queries import REGISTRY, _ensure_loaded
from parquet_ingestor_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registered query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--list", dest="list_", metavar="PATTERN",
                    nargs="?", const="", default=None)
    args = ap.parse_args()

    _ensure_loaded()
    if args.list_ is not None:
        for name, q in REGISTRY.items():
            if args.list_ in name:
                kind = "oracle" if q.oracle else "rows-only"
                print(f"{name:38s} [{kind}] {q.doc}")
        return
    if not args.name:
        ap.error("query name required (or --list)")
    if args.name not in REGISTRY:
        near = [n for n in REGISTRY if args.name in n]
        hint = f" — did you mean: {', '.join(near)}?" if near else ""
        raise SystemExit(f"unknown query {args.name!r}{hint}")

    q = REGISTRY[args.name]
    spark = get_spark(app_name=f"run-{args.name}", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    df = q.fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.show, truncate=60)
    if args.oracle:
        if not q.oracle:
            print("(rows-only entry: no SQL oracle registered)")
        else:
            from parquet_ingestor_spark.testing import (
                duck_canon,
                duck_connect,
                spark_canon,
            )

            con = duck_connect(args.sf)
            match = spark_canon(df) == duck_canon(con, q.oracle)
            print(f"oracle match: {match}")
            if not match:
                raise SystemExit(1)
    spark.stop()


if __name__ == "__main__":
    main()
