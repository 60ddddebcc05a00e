"""federated_gcn_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing capabilities
of the reference repo ``IsuruMaduranga/federated-gcn`` (a federated GraphSAGE
framework built on pandas + StellarGraph + TCP sockets), rebuilt Spark-first:

- the reference's dataflow operators (scans, projections, unions, keep-first
  dedup, FedAvg aggregation — SURVEY.md §2) become declarative DataFrame
  plans optimized by Catalyst;
- its graph-ML operators (neighbor sampling, random walks, edge splits,
  GraphSAGE message passing — SURVEY.md §2.6) become join/window/HOF
  compositions plus Arrow-batched pandas UDF kernels;
- its socket-and-pickle federated round loop becomes a driver-side loop over
  ``groupBy(partition_id).applyInPandas(train)`` + a FedAvg aggregation;
- large-scale training-data-pipeline extensions (dedup, similarity search,
  text analysis, multimodal columns) are first-class operators.

Nothing in here is a port: the reference is cited (file:line) in docstrings
only to pin down *semantics*.
"""

__version__ = "0.1.0"

from federated_gcn_spark.session import get_spark  # noqa: F401
