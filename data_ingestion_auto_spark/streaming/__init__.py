from .incremental import (  # noqa: F401
    file_stream,
    sessionized_stream,
    start_windowed_aggregate,
    windowed_counts,
)
