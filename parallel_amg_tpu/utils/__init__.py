"""Auxiliary subsystems: checkpointing, profiling/roofline, logging
(SURVEY.md §5)."""
