from .foreach_batch import validate_stream  # noqa: F401
