from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore  # noqa: F401
