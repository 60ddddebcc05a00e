from federated_gcn_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    run_available_now,
    tumbling_value_agg,
)
from federated_gcn_spark.streaming.rounds import streaming_fedavg  # noqa: F401
from federated_gcn_spark.streaming.curation import streaming_curation  # noqa: F401
from federated_gcn_spark.streaming.dedup import streaming_exact_dedup  # noqa: F401
