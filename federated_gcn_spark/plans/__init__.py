from federated_gcn_spark.plans.queries import ORACLE, QUERIES  # noqa: F401
