"""Kafka redolog + subscriber-transport tests against FakeKafkaBroker.

Parity targets: redolog/kafka_redolog_manager.go (virtual 5000-batch files
over partition offsets, commit/checkpoint offsets in the metastore),
redolog/composite_redolog_manager.go (kafka ingest + file recovery),
subscriber/common/sink/kafka.go (publish upsert batches to the redolog
topic), subscriber/common/consumer/kafka/kafka.go (consumer offsets).
"""

import time

import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.config import RedoLogConfig
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.redolog.kafka import FakeKafkaBroker, redolog_topic
from aresdb_tpu.redolog.manager import (
    KAFKA_VIRTUAL_FILE_BATCHES,
    KafkaRedoLogManager,
)

FACT_SCHEMA = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "fare", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 64, "recordRetentionInDays": 0},
}

TOPIC = redolog_topic("", "trips")


def batch_bytes(rows):
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.Uint32)
    b.add_column(2, dt.Float32)
    for i, (t, rid, fare) in enumerate(rows):
        b.add_row()
        b.set_value(i, 0, t)
        b.set_value(i, 1, rid)
        b.set_value(i, 2, fare)
    return b.to_bytes()


def make_store(root, broker, disk=True, kafka=True):
    cfg = RedoLogConfig(disk_enabled=disk, kafka_enabled=kafka)
    ms = MemStore(DiskMetaStore(root), LocalDiskStore(root),
                  redo_log_config=cfg, kafka_transport=broker)
    return ms


def boot(root, broker, disk=True, kafka=True, create=False):
    ms = make_store(root, broker, disk=disk, kafka=kafka)
    if create:
        ms.create_table(Table.from_json(FACT_SCHEMA))
    else:
        ms.fetch_schema()
    ms.init_shards()
    return ms


def wait_rows(shard, n, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if shard.live_store.rows_visible() >= n:
            return True
        time.sleep(0.02)
    return False


# ---------------------------------------------------------------------------
# fake broker semantics
# ---------------------------------------------------------------------------

def test_fake_broker_produce_fetch_watermark():
    b = FakeKafkaBroker()
    assert b.high_watermark("t", 0) == 0
    assert b.produce("t", 0, b"a") == 0
    assert b.produce("t", 0, b"b") == 1
    assert b.produce("t", 1, b"x") == 0  # partitions independent
    assert b.high_watermark("t", 0) == 2
    assert b.fetch("t", 0, 0) == [(0, b"a"), (1, b"b")]
    assert b.fetch("t", 0, 1, max_messages=1) == [(1, b"b")]
    assert b.fetch("t", 0, 5) == []


def test_fake_broker_blocking_fetch_times_out():
    b = FakeKafkaBroker()
    t0 = time.monotonic()
    assert b.fetch("t", 0, 0, timeout=0.1) == []
    assert time.monotonic() - t0 >= 0.09


# ---------------------------------------------------------------------------
# virtual file arithmetic + checkpoint purge
# ---------------------------------------------------------------------------

def test_virtual_file_arithmetic():
    m = KafkaRedoLogManager
    assert m.offset_to_file(0) == 0
    assert m.offset_to_batch(0) == 0
    off = 3 * KAFKA_VIRTUAL_FILE_BATCHES + 17
    assert m.offset_to_file(off) == 3
    assert m.offset_to_batch(off) == 17
    assert m.file_to_offset(3, 17) == off


def test_kafka_checkpoint_advances_and_purges(tmp_root):
    broker = FakeKafkaBroker()
    meta = DiskMetaStore(tmp_root)
    mgr = KafkaRedoLogManager("trips", 0, meta, broker, topic=TOPIC)
    # two virtual files of tracked data
    f1 = KAFKA_VIRTUAL_FILE_BATCHES
    mgr._track(0, 100)
    mgr._track(5, 100)
    mgr._track(f1 + 2, 50)
    mgr.update_max_event_time(1000, 0)
    mgr.update_max_event_time(2000, 1)
    assert mgr.get_total_size() == 250

    # cutoff covers file 0 entirely (max_et 1000 < 1500, file 0 < ckpt file 1)
    mgr.checkpoint(cutoff=1500, checkpoint_file=1, checkpoint_offset=0)
    # first unpurgeable file is 1 → checkpoint offset = first offset in file 1
    assert meta.get_kafka_checkpoint_offset("trips", 0) == f1 + 2
    assert 0 not in mgr.max_event_time_per_file
    assert mgr.get_total_size() == 50


# ---------------------------------------------------------------------------
# kafka-only manager: the topic IS the WAL
# ---------------------------------------------------------------------------

def test_kafka_only_streaming_then_recovery(tmp_root):
    broker = FakeKafkaBroker()
    # pre-produce before the datanode exists (subscriber got ahead)
    broker.produce(TOPIC, 0, batch_bytes([(100, 1, 1.0), (101, 2, 2.0)]))
    broker.produce(TOPIC, 0, batch_bytes([(102, 3, 3.0)]))

    ms = boot(tmp_root, broker, disk=False, kafka=True, create=True)
    shard = ms.get_table_shard("trips", 0)
    # append must be disabled: the topic is the WAL
    with pytest.raises(RuntimeError):
        shard.redolog_manager.append(b"x")
    assert wait_rows(shard, 3)

    # live production keeps flowing
    broker.produce(TOPIC, 0, batch_bytes([(103, 4, 4.0)]))
    assert wait_rows(shard, 4)
    ms.redolog_master.stop_all()
    # commit offset persisted on close covers everything consumed
    assert ms.metastore.get_kafka_commit_offset("trips", 0) == 3

    # produce while "down"
    broker.produce(TOPIC, 0, batch_bytes([(104, 5, 5.0)]))

    # restart: recovery replays [checkpoint, commit), streaming resumes
    # from the commit offset and picks up the new batch
    ms2 = boot(tmp_root, broker, disk=False, kafka=True)
    shard2 = ms2.get_table_shard("trips", 0)
    assert wait_rows(shard2, 5)
    assert len(shard2.live_store.primary_key) == 5
    assert shard2.redolog_manager.batch_recovered == 3
    ms2.redolog_master.stop_all()


def test_kafka_only_no_duplicates_on_restart(tmp_root):
    """Replay + resume must not double-apply any offset."""
    broker = FakeKafkaBroker()
    for i in range(10):
        broker.produce(TOPIC, 0, batch_bytes([(100 + i, i, float(i))]))
    ms = boot(tmp_root, broker, disk=False, kafka=True, create=True)
    shard = ms.get_table_shard("trips", 0)
    assert wait_rows(shard, 10)
    ms.redolog_master.stop_all()

    ms2 = boot(tmp_root, broker, disk=False, kafka=True)
    shard2 = ms2.get_table_shard("trips", 0)
    assert wait_rows(shard2, 10)
    time.sleep(0.3)  # give a buggy re-consume time to show up
    assert shard2.live_store.rows_visible() == 10
    assert len(shard2.live_store.primary_key) == 10
    ms2.redolog_master.stop_all()


# ---------------------------------------------------------------------------
# composite manager: kafka ingest + file durability
# ---------------------------------------------------------------------------

def test_composite_write_through_survives_broker_loss(tmp_root):
    broker = FakeKafkaBroker()
    ms = boot(tmp_root, broker, disk=True, kafka=True, create=True)
    shard = ms.get_table_shard("trips", 0)
    broker.produce(TOPIC, 0, batch_bytes([(100, 1, 1.0), (101, 2, 2.0)]))
    broker.produce(TOPIC, 0, batch_bytes([(102, 3, 3.0)]))
    assert wait_rows(shard, 3)
    ms.redolog_master.stop_all()
    assert ms.metastore.get_kafka_commit_offset("trips", 0) == 2

    # the broker loses everything (GC/retention) — data must come back
    # from the local file WAL alone
    empty = FakeKafkaBroker()
    ms2 = boot(tmp_root, empty, disk=True, kafka=True)
    shard2 = ms2.get_table_shard("trips", 0)
    assert shard2.live_store.rows_visible() == 3
    assert len(shard2.live_store.primary_key) == 3
    ms2.redolog_master.stop_all()


def test_composite_http_and_kafka_interleave(tmp_root):
    """HTTP-ingested batches append to the WAL; kafka batches write
    through the same path; PK upserts dedupe across sources."""
    broker = FakeKafkaBroker()
    ms = boot(tmp_root, broker, disk=True, kafka=True, create=True)
    shard = ms.get_table_shard("trips", 0)
    ms.handle_ingestion("trips", 0,
                        UpsertBatch(batch_bytes([(100, 1, 1.0)])))
    broker.produce(TOPIC, 0, batch_bytes([(101, 2, 2.0),
                                          (100, 1, 9.0)]))  # updates id=1
    assert wait_rows(shard, 2)
    ms.redolog_master.stop_all()

    ms2 = boot(tmp_root, FakeKafkaBroker(), disk=True, kafka=True)
    shard2 = ms2.get_table_shard("trips", 0)
    assert shard2.live_store.rows_visible() == 2
    from aresdb_tpu.memstore.common import BASE_BATCH_ID, RecordID

    assert shard2.read_value(RecordID(BASE_BATCH_ID, 0), 2) \
        == pytest.approx(9.0)
    ms2.redolog_master.stop_all()


# ---------------------------------------------------------------------------
# subscriber: transport consumer + kafka sink
# ---------------------------------------------------------------------------

def test_transport_consumer_poll_and_resume():
    from aresdb_tpu.subscriber.subscriber import TransportConsumer

    broker = FakeKafkaBroker()
    for i in range(5):
        broker.produce("topic", 0, b"m%d" % i)
    c = TransportConsumer(broker, "topic", 0)
    msgs = c.poll(3, 0.0)
    assert [m.value for m in msgs] == [b"m0", b"m1", b"m2"]
    assert [m.offset for m in msgs] == [0, 1, 2]
    c.commit({0: msgs[-1].offset})
    assert c.committed == {0: 2}
    # resume from a committed offset in a fresh consumer
    c2 = TransportConsumer(broker, "topic", 0, start_offset=3)
    assert [m.value for m in c2.poll(10, 0.0)] == [b"m3", b"m4"]


class _WireConnector:
    """build_batch via the real wire builder, no HTTP (the real Connector
    only adds schema-service lookups around the same builder)."""

    def build_batch(self, table, columns, rows, update_modes=None):
        return batch_bytes(rows)


def test_kafka_sink_feeds_kafka_redolog(tmp_root):
    """Full loop: subscriber KafkaSink → topic → kafka-only datanode."""
    from aresdb_tpu.subscriber.subscriber import JobRules, KafkaSink

    broker = FakeKafkaBroker()
    rules = JobRules(job="j", table="trips",
                     columns=["request_at", "id", "fare"], sources={})
    sink = KafkaSink(_WireConnector(), broker, namespace="",
                     num_shards=1, pk_positions=[1])
    n = sink.save(rules, [[100, 1, 1.0], [101, 2, 2.0], [102, 3, 3.0]])
    assert n == 3
    assert broker.high_watermark(TOPIC, 0) == 1  # one batch for shard 0

    ms = boot(tmp_root, broker, disk=False, kafka=True, create=True)
    shard = ms.get_table_shard("trips", 0)
    assert wait_rows(shard, 3)
    ms.redolog_master.stop_all()


def test_kafka_sink_partitions_by_shard():
    from aresdb_tpu.subscriber.subscriber import JobRules, KafkaSink

    broker = FakeKafkaBroker()
    rules = JobRules(job="j", table="trips",
                     columns=["request_at", "id", "fare"], sources={})
    sink = KafkaSink(_WireConnector(), broker, num_shards=4,
                     pk_positions=[1])
    rows = [[100 + i, i, float(i)] for i in range(32)]
    sink.save(rules, rows)
    per_shard = [broker.high_watermark(TOPIC, p) for p in range(4)]
    assert sum(1 for c in per_shard if c > 0) >= 2  # spread across shards
    # every produced batch parses as a valid upsert batch
    for p in range(4):
        for _, payload in broker.fetch(TOPIC, p, 0):
            assert UpsertBatch(payload).num_rows > 0


def test_iterate_terminates_when_retention_skips_window(tmp_root):
    """Regression: if broker retention/compaction removed every message in
    [checkpoint, commit), fetch returns only offsets >= end and iterate
    used to refetch the same window forever (pos never advanced)."""
    import threading

    class CompactedBroker(FakeKafkaBroker):
        def fetch(self, topic, partition, offset, max_messages=500,
                  timeout=0.0):
            # everything below offset 12 was GC'd
            return [(12, b"x"), (13, b"y")]

        def high_watermark(self, topic, partition):
            return 14

    meta = DiskMetaStore(tmp_root)
    meta.update_kafka_checkpoint_offset("trips", 0, 0)
    meta.update_kafka_commit_offset("trips", 0, 10)
    mgr = KafkaRedoLogManager("trips", 0, meta, CompactedBroker(),
                              topic=TOPIC)
    out = []
    done = threading.Event()

    def run():
        out.extend(mgr.iterate())
        done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert done.wait(5), "iterate() hung on the compacted window"
    assert out == []
