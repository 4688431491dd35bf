from parquet_rewriter_spark.operators.merge import (  # noqa: F401
    OP_COLUMN,
    apply_mutations,
    delete_keys,
    merge_into_table,
    plan_dirty_files,
    upsert,
)
from parquet_rewriter_spark.operators.compact import compact  # noqa: F401
from parquet_rewriter_spark.operators.bucketing import bucketed_join, write_bucketed  # noqa: F401
from parquet_rewriter_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_near_pairs,
)
from parquet_rewriter_spark.operators.joins import asof_join, range_join  # noqa: F401
from parquet_rewriter_spark.operators.similarity import ann_lsh_topk, cosine_topk, knn_join  # noqa: F401
from parquet_rewriter_spark.operators.skew import salted_join, skew_safe_count_distinct  # noqa: F401
from parquet_rewriter_spark.operators.branch import (  # noqa: F401
    create_branch,
    create_catalog_branch,
    fast_forward,
    publish_catalog_branch,
    rebase_branch,
)
from parquet_rewriter_spark.operators.dsir import (  # noqa: F401
    dsir_log_weights,
    dsir_resample,
)
from parquet_rewriter_spark.operators.bpe import bpe_train, fertility_by  # noqa: F401
