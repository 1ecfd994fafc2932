"""Late-data semantics: with files processed as separate micro-batches,
the watermark advances after batch 1 and a too-late row arriving in
batch 2 is dropped from the aggregation — the behavior the reference
cannot express (its only time notion is the wall-clock flush interval).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def staged_stream(spark, tmp_path):
    """Two files → two micro-batches (maxFilesPerTrigger=1).

    batch 1: events at 10:00-12:59 → watermark after batch ≈ 12:59 - 1h
    batch 2: one late event at 10:30 (< watermark ⇒ dropped) and one
             fresh event at 13:30 (kept).
    """
    d = tmp_path / "in"
    d.mkdir()
    rows1 = "\n".join(
        f'{{"ts": "2024-01-01T{h:02d}:{m:02d}:00", "v": 1}}'
        for h, m in [(10, 0), (10, 20), (11, 5), (12, 59)]
    )
    (d / "a.json").write_text(rows1 + "\n")
    schema = "ts timestamp, v int"
    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    return d, stream


def test_late_rows_beyond_watermark_are_dropped(spark, staged_stream, tmp_path):
    d, stream = staged_stream
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("v").alias("total"))
        .select(F.date_format("w.start", "HH:mm").alias("h"), "total")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable()  # batch 1 → watermark advances to ~11:59

    # batch 2: a late row in the 10:00 window + a fresh 13:30 row
    (d / "b.json").write_text(
        '{"ts": "2024-01-01T10:30:00", "v": 100}\n'
        '{"ts": "2024-01-01T13:30:00", "v": 1}\n'
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    # update-mode memory sink: take the latest emission per window
    rows = spark.table("t_late").collect()
    latest = {}
    for r in rows:
        latest[r.h] = r.total  # later emissions overwrite
    # the 10:00 window must NOT include the late v=100 row
    assert latest["10:00"] == 2
    # the fresh 13:30 event landed in its 13:00 tumbling window
    assert latest.get("13:00") == 1
