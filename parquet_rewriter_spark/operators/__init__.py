from parquet_rewriter_spark.operators.merge import (  # noqa: F401
    OP_COLUMN,
    apply_mutations,
    delete_keys,
    merge_into_table,
    plan_dirty_files,
    upsert,
)
from parquet_rewriter_spark.operators.compact import compact  # noqa: F401
