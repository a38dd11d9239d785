from .readers import (  # noqa: F401
    align_by_fieldname,
    from_pandas,
    from_records,
    read_csv,
    read_parquet,
    working_dir_glob,
)
