"""Retry-policy semantics (reference retry_test.go behaviors) and the
envelope source contract."""

from __future__ import annotations

import random

import pytest

from parquet_ingestor_spark.pipeline import ENVELOPE_SCHEMA
from parquet_ingestor_spark.retry import SimpleRetry


def test_retry_succeeds_first_try():
    calls = []
    assert SimpleRetry().do(lambda: calls.append(1) or 42) == 42
    assert len(calls) == 1


def test_retry_eventually_succeeds_with_backoff_doubling():
    sleeps: list[float] = []
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise OSError("transient")
        return "ok"

    policy = SimpleRetry(attempts=5, base_delay=0.1, max_delay=10.0, jitter=False)
    assert policy.do(flaky, sleep=sleeps.append) == "ok"
    assert sleeps == [0.1, 0.2]  # doubling


def test_retry_caps_delay():
    sleeps: list[float] = []

    def always_fail():
        raise OSError("nope")

    policy = SimpleRetry(attempts=5, base_delay=1.0, max_delay=2.0, jitter=False)
    with pytest.raises(OSError):
        policy.do(always_fail, sleep=sleeps.append)
    assert sleeps == [1.0, 2.0, 2.0, 2.0]  # capped at max_delay


def test_retry_jitter_within_20_percent():
    sleeps: list[float] = []

    def always_fail():
        raise OSError("nope")

    policy = SimpleRetry(attempts=3, base_delay=1.0, max_delay=10.0, jitter=True)
    with pytest.raises(OSError):
        policy.do(always_fail, sleep=sleeps.append, rng=random.Random(7))
    assert all(0.8 <= s / d <= 1.2 for s, d in zip(sleeps, [1.0, 2.0]))


def test_retry_exhaustion_raises_last_error():
    errs = [OSError("first"), OSError("second")]

    def fail_twice():
        raise errs[min(len(calls), 1)]

    calls: list[int] = []

    def failing():
        calls.append(1)
        raise OSError(f"err{len(calls)}")

    with pytest.raises(OSError, match="err2"):
        SimpleRetry(attempts=2, base_delay=0, jitter=False).do(
            failing, sleep=lambda _: None
        )


def test_retry_cancelled_mid_backoff():
    """The reference aborts a sleeping retry on context cancel
    (reference: retry_test.go:203 semantics)."""
    state = {"stop": False}

    def failing():
        state["stop"] = True  # cancel fires after the first failure
        raise OSError("boom")

    with pytest.raises(InterruptedError):
        SimpleRetry(attempts=3, base_delay=0.01).do(
            failing, should_stop=lambda: state["stop"], sleep=lambda _: None
        )


def test_rate_source_yields_envelope_schema(spark):
    from parquet_ingestor_spark.sources import rate_envelope_source

    df = rate_envelope_source(spark)
    assert df.isStreaming
    assert df.schema.fieldNames() == ENVELOPE_SCHEMA.fieldNames()


def test_jsonl_source_yields_envelope_schema(spark, tmp_path):
    from parquet_ingestor_spark.sources import jsonl_dir_source

    (tmp_path / "x.json").write_text('{"value": "{}", "attributes": {}}\n')
    df = jsonl_dir_source(spark, str(tmp_path))
    assert df.isStreaming
    # file sources relax nullability; names+types are the contract
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in ENVELOPE_SCHEMA.fields
    ]


def test_custom_key_func_partitioning(spark, tmp_path):
    """O9 KeyFunc parity: user partition expressions replace the
    default time layout."""
    import json
    import os

    from pyspark.sql import types as T

    from parquet_ingestor_spark.pipeline import (
        PipelineConfig,
        start_stream_ingest,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    with open(landing / "a.json", "w") as f:
        for i in range(10):
            f.write(
                json.dumps(
                    {
                        "value": json.dumps(
                            {"id": i, "name": f"n{i}", "value": float(i)}
                        ),
                        "attributes": {},
                    }
                )
                + "\n"
            )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    q = start_stream_ingest(
        spark,
        str(landing),
        out,
        chk,
        schema,
        PipelineConfig(
            flush_interval="1 second",
            key_exprs={"bucket": "id % 3"},
            payload_log_every=1,
        ),
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    parts = sorted(
        p for p in os.listdir(f"{out}/data") if p.startswith("bucket=")
    )
    assert parts == ["bucket=0", "bucket=1", "bucket=2"]
    assert spark.read.parquet(f"{out}/data").count() == 10


def test_queue_poller_ack_after_durable_write(spark, tmp_path):
    """The poller lands envelopes atomically and acks only after the
    rename; a write that never completes must leave messages unacked
    (redelivery → at-least-once)."""
    import json
    import os

    from parquet_ingestor_spark.pipeline import ENVELOPE_SCHEMA
    from parquet_ingestor_spark.sources import poll_queue_once

    landing = tmp_path / "landing"
    os.makedirs(landing)
    batch = [
        {"body": json.dumps({"id": i}), "receipt": f"r{i}",
         "attributes": {"MessageId": i}}
        for i in range(5)
    ]
    deleted: list[list[str]] = []

    n = poll_queue_once(lambda: batch, deleted.append, str(landing))
    assert n == 5
    assert deleted == [["r0", "r1", "r2", "r3", "r4"]]
    # no temp debris; landed file is valid envelope JSONL
    assert not [p for p in os.listdir(landing) if p.endswith(".tmp")]
    df = spark.read.schema(ENVELOPE_SCHEMA).json(str(landing))
    assert df.count() == 5
    assert df.filter("attributes.MessageId = '3'").count() == 1

    # empty receive: no file, no ack
    assert poll_queue_once(lambda: [], deleted.append, str(landing)) == 0
    assert len(deleted) == 1

    # ack ordering: a delete that fires implies the file already exists
    seen_at_delete = {}

    def delete_probe(receipts):
        seen_at_delete["files"] = [
            p for p in os.listdir(landing) if not p.startswith(".")
        ]

    poll_queue_once(lambda: batch[:2], delete_probe, str(landing))
    assert len(seen_at_delete["files"]) == 2  # first file + this one


class _FakeSQS:
    """Stub boto3 SQS client: scripted receive batches, recorded
    delete batches, optional per-entry failures — the reference's
    batch-path test doubles (source/source_sqs_batch_test.go:122,
    :167), no network."""

    def __init__(self, batches, fail_receipts=()):
        self._batches = list(batches)
        self._fail = set(fail_receipts)
        self.receive_calls = []
        self.delete_calls = []

    def receive_message(self, **kw):
        self.receive_calls.append(kw)
        cap = kw.get("MaxNumberOfMessages", 1)  # boto3 default is 1
        msgs = []
        if self._batches:
            msgs = self._batches[0][:cap]
            rest = self._batches[0][cap:]
            if rest:
                self._batches[0] = rest
            else:
                self._batches.pop(0)
        return {
            "Messages": [
                {
                    "Body": body,
                    "ReceiptHandle": f"rh-{body}",
                    "MessageId": f"mid-{body}",
                }
                for body in msgs
            ]
        }

    def delete_message_batch(self, *, QueueUrl, Entries):
        assert len(Entries) <= 10, "SQS caps DeleteMessageBatch at 10"
        self.delete_calls.append([e["ReceiptHandle"] for e in Entries])
        return {
            "Failed": [
                {"Id": e["Id"], "SenderFault": False, "Code": "InternalError"}
                for e in Entries
                if e["ReceiptHandle"] in self._fail
            ]
        }


def test_sqs_receive_clamps_batch_size_and_maps_fields():
    from parquet_ingestor_spark.sources import sqs_receive_delete

    fake = _FakeSQS(batches=[["a", "b"]])
    receive, _ = sqs_receive_delete(
        "https://sqs.example/q", max_messages=99, client=fake
    )
    msgs = receive()
    assert fake.receive_calls[0]["MaxNumberOfMessages"] == 10  # clamped
    assert [m["body"] for m in msgs] == ["a", "b"]
    assert [m["receipt"] for m in msgs] == ["rh-a", "rh-b"]
    assert msgs[0]["attributes"] == {"MessageId": "mid-a"}
    assert receive() == []  # drained queue -> empty list, no raise


def test_sqs_delete_chunks_at_ten_and_reports_partial_failures():
    from parquet_ingestor_spark.sources import sqs_receive_delete

    fake = _FakeSQS(batches=[], fail_receipts={"rh-7", "rh-23"})
    _, delete = sqs_receive_delete("https://sqs.example/q", client=fake)
    receipts = [f"rh-{i}" for i in range(25)]
    failed = delete(receipts)
    # 25 receipts -> 10 + 10 + 5 entry batches
    assert [len(c) for c in fake.delete_calls] == [10, 10, 5]
    assert [r for c in fake.delete_calls for r in c] == receipts
    # per-entry failures map back to the right receipt handles and are
    # returned (not raised): unacked messages redeliver and the
    # idempotent batch commit absorbs the replay
    assert failed == ["rh-7", "rh-23"]


def test_queue_poller_with_stub_sqs_client(tmp_path):
    """End-to-end poll_queue_once over the stubbed boto3 pair: the
    landing file is durably written before any delete call."""
    import json
    import os

    from parquet_ingestor_spark.sources import (
        poll_queue_once,
        sqs_receive_delete,
    )

    order = []
    fake = _FakeSQS(batches=[[f"m{i}" for i in range(12)]])
    receive, delete = sqs_receive_delete("https://sqs.example/q", client=fake)

    def tracked_delete(receipts):
        # the landing file must already be in place when the ack runs
        files = [
            f for f in os.listdir(tmp_path) if not f.startswith(".")
        ]
        order.append(("delete", len(files)))
        return delete(receipts)

    n = poll_queue_once(receive, tracked_delete, str(tmp_path))
    assert n == 10  # one receive call: the SQS cap, not the 12 queued
    assert order == [("delete", 1)]
    (landed,) = [f for f in os.listdir(tmp_path) if not f.startswith(".")]
    lines = [
        json.loads(ln)
        for ln in open(os.path.join(tmp_path, landed)).read().splitlines()
    ]
    assert [r["value"] for r in lines] == [f"m{i}" for i in range(10)]
    assert lines[0]["attributes"] == {"MessageId": "mid-m0"}
