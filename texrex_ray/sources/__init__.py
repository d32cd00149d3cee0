"""Sources: record readers and deterministic fixture generators."""
