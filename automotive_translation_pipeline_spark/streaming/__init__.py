from .jobs import (  # noqa: F401
    event_session_windows,
    event_window_counts,
    ledger_state_stream,
    ledger_state_stream_tws,
    repair_pass,
    streaming_dedup,
    streaming_upsert_query,
    view_purchase_attribution,
)
from .state_inspect import (  # noqa: F401
    state_metadata,
    state_rows,
    state_skew,
)
