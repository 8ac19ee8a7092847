"""Sources & sinks: fixture generators and parquet-backed table IO."""
