"""Training: LR schedules, logger/run-state, checkpointing, the epoch loop."""
