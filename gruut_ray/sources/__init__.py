"""Sources & sinks: synthetic CC-page generator, parquet IO helpers."""
