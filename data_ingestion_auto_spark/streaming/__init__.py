from .stateful import dedup_stream, running_anomaly_stream  # noqa: F401
from .incremental import (  # noqa: F401
    file_stream,
    sessionized_stream,
    start_foreach_batch_upsert,
    start_windowed_aggregate,
    stream_static_anomaly,
    windowed_counts,
)
