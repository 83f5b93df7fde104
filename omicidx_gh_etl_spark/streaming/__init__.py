from .windows import run_streaming_window_counts, streaming_window_counts

__all__ = ["streaming_window_counts", "run_streaming_window_counts"]
