import pytest

from federated_gcn_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "1048576"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def toy_graph(spark):
    """Two components: a 5-cycle with a chord (0-4) and a 2-path (10-11-12)."""
    from federated_gcn_spark.graph import Graph

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3), (10, 11), (11, 12)],
        "src long, dst long",
    )
    return Graph.from_edges(edges)
