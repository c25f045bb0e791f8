from .events import (  # noqa: F401
    read_events_stream,
    run_available_now,
    streaming_hourly_rollup,
    streaming_sessionize,
)
