from .pipeline import (  # noqa: F401
    event_status_mapping,
    run_events_stream,
    run_windowed_stream,
)
