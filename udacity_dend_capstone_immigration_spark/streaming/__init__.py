"""Structured Streaming layer.

The reference is batch-only (SURVEY.md §2.9); this package is the
engine's streaming tier: the same window semantics as
``operators/windows.py`` expressed over unbounded input with watermarks,
plus a stateful custom-operator path (``applyInPandasWithState``).
"""

from udacity_dend_capstone_immigration_spark.streaming.windows import (
    read_stream,
    run_available_now,
    run_available_now_many,
    run_foreach_batch_parquet,
    scratch_checkpoint_dir,
    session_window_agg,
    stream_interval_join,
    watermarked_dedup,
    watermarked_sliding,
    watermarked_tumbling,
)
from udacity_dend_capstone_immigration_spark.streaming.stateful import running_totals_stateful

__all__ = [
    "read_stream",
    "run_available_now",
    "run_available_now_many",
    "run_foreach_batch_parquet",
    "scratch_checkpoint_dir",
    "session_window_agg",
    "stream_interval_join",
    "watermarked_dedup",
    "watermarked_sliding",
    "watermarked_tumbling",
    "running_totals_stateful",
]
