"""Pipeline/DAG layer: the reference's task graphs re-expressed as lazy
DataFrame compositions (SURVEY.md §3)."""
