"""Dataset-format readers and writers (HIVE format, COLMAP models, video)."""
