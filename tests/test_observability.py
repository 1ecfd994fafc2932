"""Metrics registry + listener re-keying of Spark progress into the
reference's metric taxonomy."""

from __future__ import annotations

from types import SimpleNamespace

from parquet_ingestor_spark.observability import (
    IngestMetricsListener,
    MetricsRegistry,
    statsd_adapter,
)


def test_registry_counters_and_gauges():
    reg = MetricsRegistry()
    reg.add_counter("ingestor_messages_received_total", 10)
    reg.add_counter("ingestor_messages_received_total", 5)
    reg.set_gauge("ingestor_flush_duration_ms", 123.0)
    snap = reg.snapshot()
    assert snap["ingestor_messages_received_total"] == 15
    assert snap["ingestor_flush_duration_ms"] == 123.0


def test_adapter_fanout_statsd_lines():
    lines: list[str] = []
    reg = MetricsRegistry()
    reg.add_adapter(statsd_adapter(lines.append))
    reg.add_counter("ingestor_flush_completed_total")
    reg.set_gauge("ingestor_source_buffer_usage", 0.5)
    assert lines == [
        "ingestor.ingestor_flush_completed_total:1.0|c",
        "ingestor.ingestor_source_buffer_usage:0.5|g",
    ]


def _progress_event(**kw):
    base = dict(
        numInputRows=100,
        batchDuration=250,
        inputRowsPerSecond=400.0,
        processedRowsPerSecond=800.0,
    )
    base.update(kw)
    return SimpleNamespace(progress=SimpleNamespace(**base))


def test_listener_rekeys_progress():
    listener = IngestMetricsListener()
    listener.onQueryStarted(SimpleNamespace(id="q"))
    listener.onQueryProgress(_progress_event())
    listener.onQueryProgress(_progress_event(numInputRows=50))
    snap = listener.registry.snapshot()
    assert snap["ingestor_messages_received_total"] == 150
    assert snap["ingestor_flush_completed_total"] == 2
    assert snap["ingestor_flush_duration_ms"] == 250
    assert snap["ingestor_source_buffer_usage"] == 0.5
    assert snap["ingestor_run_started_total"] == 1


def test_listener_counts_errors_on_termination():
    listener = IngestMetricsListener()
    listener.onQueryTerminated(SimpleNamespace(exception="boom"))
    listener.onQueryTerminated(SimpleNamespace(exception=None))
    snap = listener.registry.snapshot()
    assert snap["ingestor_run_errors_total"] == 1
    assert snap["ingestor_run_stopped_total"] == 2


def test_listener_attaches_to_real_stream(spark, tmp_path):
    """End-to-end: listener sees progress from an actual streaming query."""
    listener = IngestMetricsListener()
    spark.streams.addListener(listener)
    try:
        df = spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        q = (
            df.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "chk"))
            .start()
        )
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            snap = listener.registry.snapshot()
            if snap.get("ingestor_flush_completed_total", 0) >= 1:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
        snap = listener.registry.snapshot()
        assert snap.get("ingestor_flush_completed_total", 0) >= 1
    finally:
        spark.streams.removeListener(listener)
