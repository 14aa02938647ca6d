"""AresDB-TPU: a TPU-native real-time analytics storage + query engine.

A from-scratch rebuild of the capabilities of uber/aresdb (GPU/CUDA columnar
analytics engine) designed for TPU hardware: the physical query layer runs as
JAX/XLA programs (with Pallas kernels for hot ops) instead of CUDA kernels,
selection is mask-carrying instead of index-compaction, group-by is
sort/segment-reduce with static shapes instead of dynamic reduce_by_key, and
multi-chip scaling uses jax.sharding meshes + collectives instead of
per-query device placement.

Layer map (mirrors reference layer map in SURVEY.md §1):
  api/        REST surface (query/data/schema/debug)
  query/      AQL/SQL front end, compiler, TPU executor
  ops/        Pallas/XLA physical operators (the CUDA layer equivalent)
  memstore/   live + archive columnar stores, ingestion, jobs
  redolog/    write-ahead logs
  diskstore/  on-disk column files
  metastore/  schema + watermark persistence
  parallel/   device mesh sharding, distributed fan-out
  client/     ingestion client SDK
  common/     data types, schema model, upsert batch wire format
  utils/      hashing, time utilities, metrics
"""

__version__ = "0.1.0"
