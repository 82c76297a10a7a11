from .incremental import (  # noqa: F401
    stream_incremental_append,
    stream_windowed_counts,
)
