"""Pipeline orchestration: staged execution with snapshot checkpointing,
per-partition lineage + metrics, resume (SURVEY.md §2.11 N4)."""
