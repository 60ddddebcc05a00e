"""Streaming federated-aggregation barrier (A4 + A1 as a stateful op).

The reference's server fires FedAvg only when len(weights) == MAX_CONN —
all clients reported (fl_server.py:65). In the streaming engine, client
updates *arrive* (as parameter-table parquet files dropped in a
directory) and a custom stateful operator keyed by (round, layer)
accumulates Σnᵢwᵢ and Σnᵢ, emitting the averaged tensor exactly when the
count barrier is reached — applyInPandasWithState, the Spark-native
spelling of "custom stateful streaming operator".

Non-SQL-expressible by design (state across triggers); covered by
rows-only checks + batch-equivalence tests (tests/test_streaming.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

UPDATE_SCHEMA = StructType(
    [
        StructField("round", IntegerType()),
        StructField("client_id", LongType()),
        StructField("layer", IntegerType()),
        StructField("values", ArrayType(DoubleType())),
        StructField("num_examples", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("round", IntegerType()),
        StructField("layer", IntegerType()),
        StructField("values", ArrayType(DoubleType())),
        StructField("n_clients", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("weighted_sum", ArrayType(DoubleType())),
        StructField("total_n", DoubleType()),
        StructField("n_clients", IntegerType()),
    ]
)


def _barrier_fn(expected_clients: int):
    def fn(key, pdf_iter, state: GroupState):
        round_no, layer = key
        if state.exists:
            wsum, total_n, n_clients = state.get
            wsum = np.asarray(wsum, dtype="float64")
        else:
            wsum, total_n, n_clients = None, 0.0, 0
        for pdf in pdf_iter:
            for _, row in pdf.iterrows():
                v = np.asarray(row["values"], dtype="float64") * float(row["num_examples"])
                wsum = v if wsum is None else wsum + v
                total_n += float(row["num_examples"])
                n_clients += 1
        if n_clients >= expected_clients and wsum is not None:
            avg = (wsum / total_n).tolist()
            state.remove()  # barrier fired: reset for a possible re-report
            yield pd.DataFrame(
                {
                    "round": [int(round_no)],
                    "layer": [int(layer)],
                    "values": [avg],
                    "n_clients": [int(n_clients)],
                }
            )
        else:
            state.update((wsum.tolist() if wsum is not None else [], total_n, n_clients))

    return fn


def streaming_fedavg(
    spark: SparkSession,
    updates_dir: str,
    expected_clients: int,
) -> DataFrame:
    """Watch ``updates_dir`` for client weight pushes; emit one averaged
    row per (round, layer) once all ``expected_clients`` reported."""
    updates = spark.readStream.schema(UPDATE_SCHEMA).parquet(updates_dir)
    return (
        updates.groupBy("round", "layer")
        .applyInPandasWithState(
            _barrier_fn(expected_clients),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def foreach_batch_fedavg(
    spark: SparkSession,
    updates_path: str,
    expected_clients: int,
    on_round,
    query_name: str = "fedavg_rounds",
):
    """The foreachBatch spelling of the round barrier (SURVEY.md §2.8):
    each micro-batch of arriving client updates lands in a driver-side
    pending pool (weight tensors — KBs per client, never row data);
    every round whose client count reaches the barrier is FedAvg'd with
    numpy in arrival-independent (client, layer) order and handed to
    ``on_round(round, {layer: ndarray})``, then dropped from the pool.

    Use the applyInPandasWithState variant (streaming_fedavg) when the
    aggregation state itself must live in the engine (exactly-once,
    failure recovery); this variant trades that for arbitrary driver
    logic between rounds — the literal replacement for the reference's
    fl_server event loop.

    Returns the StreamingQuery (caller stops it).
    """
    pending: dict[int, list] = {}

    def process_batch(batch_df: DataFrame, _batch_id: int):
        for r in batch_df.collect():
            pending.setdefault(int(r["round"]), []).append(r)
        for round_no in sorted(pending):
            rows = pending[round_no]
            clients = {int(r["client_id"]) for r in rows}
            if len(clients) < expected_clients:
                continue
            by_layer: dict[int, list] = {}
            for r in sorted(rows, key=lambda r: (int(r["client_id"]), int(r["layer"]))):
                by_layer.setdefault(int(r["layer"]), []).append(r)
            averaged = {
                layer: sum(
                    np.asarray(r["values"], dtype="float64") * float(r["num_examples"])
                    for r in lrows
                )
                / sum(float(r["num_examples"]) for r in lrows)
                for layer, lrows in by_layer.items()
            }
            on_round(round_no, averaged)
            del pending[round_no]

    stream = spark.readStream.schema(UPDATE_SCHEMA).parquet(updates_path)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .trigger(processingTime="1 second")
        .start()
    )
