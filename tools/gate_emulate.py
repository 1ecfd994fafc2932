#!/usr/bin/env python
"""Emulate the driver's CORRECTNESS gate locally: run the FIRST N
registered entries (the window the driver checks) at sf0.01, compare
each against its DuckDB oracle with the same canonicalization the
driver uses, and print a pass/fail table.

Usage: python tools/gate_emulate.py [N] [sf_dir[,sf_dir...]]
       python tools/gate_emulate.py name1,name2,... [sf_dir[,sf_dir...]]

The first argument is either a window size (gate the FIRST N
registered entries, the driver's window shape) or a comma-separated
list of entry names (gate exactly those — the targeted-recheck shape
after an operator or oracle change). Multiple sf_dirs run the same
set at each scale; a divergence that only fires at sf0.1 (the
quantization-boundary class) never shows in a sf0.01-only gate.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_ingestor_spark.queries import REGISTRY, _ensure_loaded
from parquet_ingestor_spark.session import get_spark
from parquet_ingestor_spark.testing import (
    _pdf_rows,
    canon_rows,
    driver_canon_probe,
    duck_canon,
    duck_connect,
    env_fingerprint,
    oracle_hugeint_cols,
    rounding_battery,
)


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "50"
    sf_dirs = (
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    ).split(",")
    _ensure_loaded()
    if arg.isdigit():
        names = list(REGISTRY)[: int(arg)]
    else:
        names = arg.split(",")
        unknown = [x for x in names if x not in REGISTRY]
        if unknown:
            sys.exit(f"unknown entries: {unknown}")
    spark = get_spark(app_name="gate-emulate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dirs[0])
    # environment fingerprint + cross-engine rounding battery FIRST:
    # if the two engines disagree on any rounding edge here, every
    # hash mismatch below is suspect (the r5 neyman class) — and if
    # they agree locally but the driver still reds, the fingerprint
    # is the diff to chase.
    import json as _json

    print("env:", _json.dumps(env_fingerprint()))
    drift = rounding_battery(spark, con)
    if drift:
        print(f"ROUNDING DRIFT inside the sanctioned 2^40 domain "
              f"({len(drift)} edges) — hash mismatches below are suspect:")
        for line in drift:
            print("  ", line)
    else:
        print("rounding battery: engines agree on all in-domain edges")
    extra = rounding_battery(spark, con, max_abs=9e18)
    for line in extra:
        if line not in drift:
            print("  (known out-of-domain divergence)", line)
    bad = 0
    total = 0
    for sf_dir in sf_dirs:
        con = duck_connect(sf_dir)
        tag = os.path.basename(sf_dir.rstrip("/")) + " " if len(sf_dirs) > 1 else ""
        total += len(names)
        for name in names:
            q = REGISTRY[name]
            t0 = time.perf_counter()
            try:
                df = q.fn(spark, sf_dir)
                # pandas on the Spark side too — the driver's data path
                # (r6: fetchall-based local canon was blind to the
                # HUGEINT→float64 oracle class).
                cols, rows = _pdf_rows(df.toPandas())
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL  {tag}{name}: spark error {exc!r}")
                bad += 1
                continue
            try:
                # driver-faithful pandas canonicalization probe: catches
                # schemas (list/struct cells) the driver cannot hash.
                # Rows-only entries only get a row COUNT from the driver,
                # so a non-hashable schema there is a warning, not a fail.
                driver_canon_probe(cols, rows)
            except TypeError as exc:
                if q.oracle is not None:
                    print(
                        f"FAIL  {tag}{name}: driver-canon incompatible "
                        f"output ({exc})"
                    )
                    bad += 1
                    continue
                print(f"warn  {tag}{name}: non-hashable output "
                      f"(rows-only): {exc}")
            got = canon_rows(cols, rows)
            dt = time.perf_counter() - t0
            if q.oracle is None:
                print(f"rows  {tag}{name}: {len(got)} rows "
                      f"({dt:.1f}s, rows-only)")
                continue
            huge = oracle_hugeint_cols(con, q.oracle)
            if huge:
                print(f"FAIL  {tag}{name}: oracle HUGEINT columns {huge} — "
                      f"pandas coerces to float64 at the driver; wrap in "
                      f"CAST(... AS BIGINT)")
                bad += 1
                continue
            try:
                want = duck_canon(con, q.oracle)
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL  {tag}{name}: oracle error {exc!r}")
                bad += 1
                continue
            if got == want:
                print(f"ok    {tag}{name}: {len(got)} rows ({dt:.1f}s)")
            else:
                bad += 1
                sa, sb = set(got), set(want)
                print(
                    f"FAIL  {tag}{name}: spark={len(got)} oracle={len(want)} "
                    f"only_spark={sorted(sa - sb)[:2]} "
                    f"only_oracle={sorted(sb - sa)[:2]}"
                )
    print(f"\n{total - bad}/{total} pass")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
