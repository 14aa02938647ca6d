from aresdb_tpu.redolog.file_redolog import FileRedoLogManager  # noqa: F401
