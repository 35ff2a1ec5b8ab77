"""Pipeline assemblies: flagship extraction, relational/oracle queries,
metrics, dedup/similarity suites."""
