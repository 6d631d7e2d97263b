"""Sources & sinks: the deterministic ``pages`` fixture generator and
parquet read helpers."""
