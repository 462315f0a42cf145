from .ingest import (  # noqa: F401
    append_stream,
    clean_microbatch,
    clean_stream,
    clean_then_index_stream,
    dedup_stream,
    dedup_stream_against,
    sessionize_stream,
    stream_turn_stats,
    with_fingerprint,
)
