from .incremental import (  # noqa: F401
    stream_incremental_append,
    stream_windowed_counts,
)
from .stateful import stream_user_totals_with_state  # noqa: F401
