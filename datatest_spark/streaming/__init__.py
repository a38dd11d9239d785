from .foreach_batch import transform_stream, validate_stream  # noqa: F401
from .stateful import rocksdb_state_conf, streaming_dedup  # noqa: F401
from .windowed import windowed_drift_psi, windowed_profile  # noqa: F401
