"""Subscriber ETL pipeline tests (parity: subscriber/common/* behaviors)."""

import json
import time

import pytest
import requests

from aresdb_tpu.subscriber.subscriber import (
    AresSink,
    Driver,
    JobRules,
    ListConsumer,
    Message,
    StreamingProcessor,
    SubscriberController,
    Transformation,
    apply_transformation,
    parse_message,
    shard_of,
)

NOW = 1_600_000_000

RULES = JobRules(
    job="trips-ingest",
    table="trips",
    columns=["request_at", "id", "status", "fare"],
    sources={
        "request_at": Transformation(type="timestamp", source="event_time"),
        "id": Transformation(source="trip_id"),
        "status": Transformation(source="state", default="unknown"),
        "fare": Transformation(source="fare_amount"),
    },
)


def msg(doc):
    return Message(key=b"", value=json.dumps(doc).encode())


def test_transformations():
    assert apply_transformation(
        Transformation(type="timestamp", source="t"), {"t": 1600000000}) \
        == 1600000000
    assert apply_transformation(
        Transformation(type="timestamp", source="t"),
        {"t": 1600000000123}) == 1600000000
    assert apply_transformation(
        Transformation(type="timestamp", source="t"),
        {"t": "2020-09-13T12:26:40+00:00"}) == 1600000000
    assert apply_transformation(
        Transformation(source="x", default="5"), {}) == "5"
    v = apply_transformation(
        Transformation(type="uuid_hll", source="u"),
        {"u": "d585cc25-5ca9-4655-855d-dcb94a0b9f04"})
    assert isinstance(v, int) and v >= 0


def test_parse_message():
    row = parse_message(RULES, json.dumps({
        "event_time": NOW, "trip_id": 7, "state": "completed",
        "fare_amount": 12.5}).encode())
    assert row == [NOW, 7, "completed", 12.5]
    # bad json dropped
    assert parse_message(RULES, b"{not json") is None
    # missing field with default
    row = parse_message(RULES, json.dumps({
        "event_time": NOW, "trip_id": 8, "fare_amount": 1.0}).encode())
    assert row[2] == "unknown"


def test_shard_routing_stable():
    a = shard_of([123], 4)
    assert a == shard_of([123], 4)
    assert 0 <= a < 4
    assert shard_of([123], 1) == 0
    spread = {shard_of([i], 4) for i in range(100)}
    assert len(spread) == 4  # all shards hit


class _FakeConnector:
    def __init__(self):
        self.calls = []

    def insert(self, table, columns, rows, update_modes=None, shard_id=0):
        self.calls.append((table, shard_id, len(rows)))
        return {"inserted": len(rows), "updated": 0}


def test_streaming_processor_pipeline():
    docs = [{"event_time": NOW - i, "trip_id": i, "state": "completed",
             "fare_amount": float(i)} for i in range(25)]
    consumer = ListConsumer([msg(d) for d in docs] + [Message(b"", b"junk")])
    conn = _FakeConnector()
    sink = AresSink(conn, num_shards=2, pk_positions=[1])
    proc = StreamingProcessor(RULES, consumer, sink, batch_size=100)
    written = proc.run_once()
    assert written == 25
    assert proc.messages_dropped == 1
    assert sum(c[2] for c in conn.calls) == 25
    shards = {c[1] for c in conn.calls}
    assert shards == {0, 1}


def test_subscriber_assignment_sync():
    from aresdb_tpu.controller.server import ControllerServer
    from aresdb_tpu.controller.state import ControllerState

    ctrl = ControllerServer(ControllerState())
    port = ctrl.start_background()
    base = f"http://localhost:{port}"
    try:
        requests.post(f"{base}/namespaces", json={"namespace": "ns"})
        requests.post(f"{base}/assignment/ns/jobs",
                      json={"name": "job1", "table": "trips",
                            "topic": "trips-topic"})

        made = []

        def make_processor(job):
            made.append(job["name"])
            return StreamingProcessor(
                RULES, ListConsumer([]), AresSink(_FakeConnector()))

        sc = SubscriberController(f"localhost:{port}", "ns", "sub1",
                                  make_processor, poll_seconds=0.2)
        jobs = sc.sync_once()
        assert jobs == ["job1"]
        assert made == ["job1"]

        # removing the job drops the processor on next sync
        requests.post(f"{base}/assignment/ns/jobs",
                      json={"name": "job2", "table": "trips",
                            "topic": "t2"})
        jobs = sc.sync_once()
        assert "job2" in jobs
        sc.driver.stop_all()
    finally:
        ctrl.stop()


def test_kafka_gated():
    from aresdb_tpu.subscriber.subscriber import KafkaConsumer

    with pytest.raises(RuntimeError, match="confluent-kafka"):
        KafkaConsumer(["b1"], "topic", "group")


def test_retry_failure_handler_backoff_then_success():
    """retry_failure_handler.go: constant-or-increasing backoff; succeeds
    once the sink recovers, offsets commit, nothing is dropped."""
    from aresdb_tpu.subscriber.subscriber import RetryFailureHandler

    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise RuntimeError("ares down")
        return 7

    h = RetryFailureHandler(init_interval=1.0, multiplier=2.0,
                            max_elapsed=100.0, sleep=sleeps.append)
    assert h.handle(flaky) == 7
    assert sleeps == [1.0, 2.0, 4.0]  # exponential
    assert h.retries == 3 and h.batches_abandoned == 0


def test_retry_failure_handler_abandons_after_max_elapsed():
    from aresdb_tpu.subscriber.subscriber import RetryFailureHandler

    sleeps = []

    def always_fails():
        raise RuntimeError("ares down")

    h = RetryFailureHandler(init_interval=1.0, multiplier=2.0,
                            max_elapsed=10.0, sleep=sleeps.append)
    assert h.handle(always_fails) is None
    # 1 + 2 + 4 = 7 <= 10, next 8 would exceed: exactly 3 retries
    assert sleeps == [1.0, 2.0, 4.0]
    assert h.batches_abandoned == 1


def test_processor_abandons_poison_batch_and_continues():
    """A batch whose save never succeeds is dropped after retries and the
    pipeline keeps consuming (offsets committed past it)."""
    from aresdb_tpu.subscriber.subscriber import RetryFailureHandler

    rules = RULES
    msgs = [Message(key=b"", partition=0, offset=i,
                    value=json.dumps({"event_time": NOW, "trip_id": i,
                                      "state": "done",
                                      "fare_amount": 2.0}).encode())
            for i in range(3)]
    consumer = ListConsumer(msgs)

    class PoisonSink:
        def __init__(self):
            self.calls = 0

        def save(self, rules, rows):
            self.calls += 1
            raise RuntimeError("always fails")

    sink = PoisonSink()
    h = RetryFailureHandler(init_interval=1.0, multiplier=1.0,
                            max_elapsed=2.0, sleep=lambda s: None)
    p = StreamingProcessor(rules, consumer, sink, batch_size=10,
                           flush_interval=0, failure_handler=h)
    written = p.run_once()
    assert written == 0
    assert p.messages_dropped == 3
    assert sink.calls == 3  # initial + 2 retries
    assert consumer.committed  # offsets advanced past the poison batch
