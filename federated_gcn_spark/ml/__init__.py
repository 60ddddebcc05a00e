from federated_gcn_spark.ml.kernels import GraphSAGELinkModel, LinearModel  # noqa: F401
from federated_gcn_spark.ml.federated import federated_fit  # noqa: F401
