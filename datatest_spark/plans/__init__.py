from .checkpoint import CheckpointedRun, run_checkpointed  # noqa: F401
