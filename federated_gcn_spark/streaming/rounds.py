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
        StructField("raw_sum", ArrayType(DoubleType())),
        StructField("total_n", DoubleType()),
        StructField("n_clients", IntegerType()),
    ]
)


def _barrier_fn(expected_clients: int):
    def fn(key, pdf_iter, state: GroupState):
        round_no, layer = key
        if state.exists:
            wsum, rsum, total_n, n_clients = state.get
            wsum = np.asarray(wsum, dtype="float64")
            rsum = np.asarray(rsum, dtype="float64")
        else:
            wsum, rsum, total_n, n_clients = None, None, 0.0, 0
        for pdf in pdf_iter:
            for _, row in pdf.iterrows():
                raw = np.asarray(row["values"], dtype="float64")
                v = raw * float(row["num_examples"])
                wsum = v if wsum is None else wsum + v
                rsum = raw if rsum is None else rsum + raw
                total_n += float(row["num_examples"])
                n_clients += 1
        if n_clients >= expected_clients and wsum is not None:
            # all-zero example counts: degrade to the unweighted mean,
            # matching batch fedavg (operators/fedavg.py) instead of inf/NaN
            if total_n > 0:
                avg = (wsum / total_n).tolist()
            else:
                avg = (rsum / n_clients).tolist()
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
            state.update(
                (
                    wsum.tolist() if wsum is not None else [],
                    rsum.tolist() if rsum is not None else [],
                    total_n,
                    n_clients,
                )
            )

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
            # barrier: every expected client present AND holding a complete
            # layer set — a client whose per-layer rows split across
            # micro-batches (multi-file push) must not be averaged partially
            layers_by_client: dict[int, set] = {}
            for r in rows:
                layers_by_client.setdefault(int(r["client_id"]), set()).add(
                    int(r["layer"])
                )
            if len(layers_by_client) < expected_clients:
                continue
            all_layers = set().union(*layers_by_client.values())
            if any(ls != all_layers for ls in layers_by_client.values()):
                continue
            by_layer: dict[int, list] = {}
            for r in sorted(rows, key=lambda r: (int(r["client_id"]), int(r["layer"]))):
                by_layer.setdefault(int(r["layer"]), []).append(r)
            averaged = {}
            for layer, lrows in by_layer.items():
                wsum = sum(
                    np.asarray(r["values"], dtype="float64") * float(r["num_examples"])
                    for r in lrows
                )
                total_n = sum(float(r["num_examples"]) for r in lrows)
                if total_n > 0:
                    averaged[layer] = wsum / total_n
                else:  # all-zero counts: unweighted mean (batch-fedavg parity)
                    averaged[layer] = sum(
                        np.asarray(r["values"], dtype="float64") for r in lrows
                    ) / len(lrows)
            on_round(round_no, averaged)
            del pending[round_no]

    stream = spark.readStream.schema(UPDATE_SCHEMA).parquet(updates_path)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .trigger(processingTime="1 second")
        .start()
    )
