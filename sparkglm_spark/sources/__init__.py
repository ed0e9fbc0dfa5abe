from sparkglm_spark.sources.io import (
    TABLE_SCHEMAS,
    read_with_schema,
    table_schema,
    write_partitioned,
)

__all__ = [
    "TABLE_SCHEMAS",
    "read_with_schema",
    "table_schema",
    "write_partitioned",
]
