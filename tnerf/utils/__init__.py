"""Infrastructure: metrics, checkpointing, logging, profiling (the
auxiliary subsystems the reference lacks — SURVEY §5)."""
