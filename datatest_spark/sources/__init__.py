from .readers import (  # noqa: F401
    align_by_fieldname,
    from_pandas,
    from_records,
    iceberg_available,
    read_csv,
    read_dbf,
    read_excel,
    read_parquet,
    read_table,
    working_dir_glob,
)
from .bucketed import assert_no_shuffle_join, write_bucketed  # noqa: F401
from .iceberg_lite import (  # noqa: F401
    append_equality_deletes,
    append_iceberg,
    delete_where,
    expire_snapshots,
    incremental_files,
    is_iceberg_table,
    plan_files,
    read_iceberg,
    read_iceberg_incremental,
    rollback_to_snapshot,
    schema_history,
    snapshots,
    validate_schema_evolution,
)
