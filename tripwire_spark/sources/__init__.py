"""Sources & sinks: seed scans, deterministic synthetic fixtures,
snapshot tables (SURVEY.md §2.1)."""
