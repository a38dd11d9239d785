from .checkpoint import CheckpointedRun, run_checkpointed  # noqa: F401
from .skew import (  # noqa: F401
    enable_adaptive,
    key_skew_stats,
    salted_repartition,
)
