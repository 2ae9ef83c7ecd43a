"""The URL-frontier + fetch-scheduler engine: driver-orchestrated
DataFrame micro-batch rounds over checkpointed tables (SURVEY.md §7)."""
