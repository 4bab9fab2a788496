"""Training runtime: pjit train steps, schedulers, checkpointing, reporting."""
