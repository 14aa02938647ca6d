"""Redolog manager master: file / kafka / composite backend factory.

Reference: redolog/redolog_manager_master.go:45 (NewRedologManagerMaster),
redolog/kafka_redolog_manager.go:29 (virtual 5000-batch "files" over
partition offsets, commit/checkpoint offsets in the metastore),
redolog/composite_redolog_manager.go:27 (kafka ingest + local file recovery).

Kafka transports are gated in this environment (no client library); the
kafka-backed managers keep the reference's semantics behind the same
interface and raise a clear error at construction until a Kafka client is
installed.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

from aresdb_tpu.redolog.file_redolog import FileRedoLogManager

KAFKA_VIRTUAL_FILE_BATCHES = 5000  # reference: maxBatchesPerFile


class KafkaRedoLogManager:
    """Kafka-as-WAL: partition offsets grouped into virtual files.

    Gated: requires a Kafka client library.
    """

    def __init__(self, table: str, shard: int, metastore, brokers,
                 consumer=None):
        self.table = table
        self.shard = shard
        self.metastore = metastore
        if consumer is None:
            try:
                import confluent_kafka  # noqa: F401
            except ImportError as e:
                raise RuntimeError(
                    "Kafka redolog requires the confluent-kafka package, "
                    "which is not installed in this environment") from e
        self.consumer = consumer

    @staticmethod
    def offset_to_file(offset: int) -> int:
        return offset // KAFKA_VIRTUAL_FILE_BATCHES

    @staticmethod
    def offset_to_batch(offset: int) -> int:
        return offset % KAFKA_VIRTUAL_FILE_BATCHES

    def append(self, batch_bytes: bytes, max_event_time: int = 0
               ) -> Tuple[int, int]:
        raise RuntimeError("kafka redolog is ingest-side only via producer")

    def iterate(self, checkpoint_file: int = 0, checkpoint_offset: int = 0
                ) -> Iterator[Tuple[int, int, bytes]]:
        offset = checkpoint_file * KAFKA_VIRTUAL_FILE_BATCHES + checkpoint_offset
        for msg in self.consumer.replay_from(offset):
            yield (self.offset_to_file(msg.offset),
                   self.offset_to_batch(msg.offset), msg.value)

    def checkpoint(self, cutoff: int, checkpoint_file: int,
                   checkpoint_offset: int) -> None:
        self.metastore.update_redolog_checkpoint(
            self.table, self.shard, checkpoint_file, checkpoint_offset)

    def update_max_event_time(self, event_time: int, redo_file: int) -> None:
        pass

    def get_total_size(self) -> int:
        return 0

    def close(self) -> None:
        if self.consumer is not None and hasattr(self.consumer, "close"):
            self.consumer.close()


class CompositeRedoLogManager:
    """Kafka ingestion + local file recovery (reference composite manager)."""

    def __init__(self, file_manager: FileRedoLogManager,
                 kafka_manager: KafkaRedoLogManager):
        self.file_manager = file_manager
        self.kafka_manager = kafka_manager

    def append(self, batch_bytes: bytes, max_event_time: int = 0):
        return self.file_manager.append(batch_bytes, max_event_time)

    def iterate(self, checkpoint_file: int = 0, checkpoint_offset: int = 0):
        return self.file_manager.iterate(checkpoint_file, checkpoint_offset)

    def checkpoint(self, cutoff: int, checkpoint_file: int,
                   checkpoint_offset: int) -> None:
        self.file_manager.checkpoint(cutoff, checkpoint_file,
                                     checkpoint_offset)
        self.kafka_manager.checkpoint(cutoff, checkpoint_file,
                                      checkpoint_offset)

    def update_max_event_time(self, event_time: int, redo_file: int) -> None:
        self.file_manager.update_max_event_time(event_time, redo_file)

    def get_total_size(self) -> int:
        return self.file_manager.get_total_size()

    def close(self) -> None:
        self.file_manager.close()
        self.kafka_manager.close()


class RedoLogManagerMaster:
    """Per-(table, shard) manager factory (reference master :45)."""

    def __init__(self, diskstore, metastore, redo_log_config=None):
        self.diskstore = diskstore
        self.metastore = metastore
        self.config = redo_log_config
        self.managers = {}

    def new_redolog_manager(self, table: str, shard: int, table_config):
        key = (table, shard)
        if key in self.managers:
            return self.managers[key]
        file_mgr = FileRedoLogManager(
            table, shard, self.diskstore,
            rotation_interval=table_config.redo_log_rotation_interval,
            max_redolog_size=table_config.max_redo_log_file_size)
        cfg = self.config
        if cfg is not None and getattr(cfg, "kafka_enabled", False):
            kafka = KafkaRedoLogManager(table, shard, self.metastore,
                                        cfg.kafka_brokers)
            mgr = CompositeRedoLogManager(file_mgr, kafka)
        else:
            mgr = file_mgr
        self.managers[key] = mgr
        return mgr

    def stop(self, table: str, shard: int) -> None:
        mgr = self.managers.pop((table, shard), None)
        if mgr is not None:
            mgr.close()

    def stop_all(self) -> None:
        for key in list(self.managers):
            self.stop(*key)
