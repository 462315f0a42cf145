from .ingest import (  # noqa: F401
    append_stream,
    sessionize_stream,
    stream_turn_stats,
)
