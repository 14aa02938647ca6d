from aresdb_tpu.metastore.disk_metastore import DiskMetaStore  # noqa: F401
