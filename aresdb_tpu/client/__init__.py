"""Client SDK: schema-cached connector building upsert batches over HTTP."""

from aresdb_tpu.client.connector import Connector  # noqa: F401
