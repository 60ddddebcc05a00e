from federated_gcn_spark.graph.graph import Graph  # noqa: F401
from federated_gcn_spark.graph.components import connected_components  # noqa: F401
from federated_gcn_spark.graph.sampling import fanout_sample, uniform_random_walks  # noqa: F401
from federated_gcn_spark.graph.split import (  # noqa: F401
    connectivity_preserving_split,
    double_split,
)
from federated_gcn_spark.graph.pagerank import pagerank  # noqa: F401
