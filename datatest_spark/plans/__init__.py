from .checkpoint import CheckpointedRun, run_checkpointed  # noqa: F401
from .incremental import (  # noqa: F401
    IncrementalRun,
    run_audit_publish,
    run_incremental,
    snapshot_watermark,
)
from .skew import (  # noqa: F401
    enable_adaptive,
    key_skew_stats,
    salted_repartition,
)
