from federated_gcn_spark.operators.merge import (  # noqa: F401
    concat_embeddings,
    merge_partition,
    union_all,
    union_keep_first,
)
