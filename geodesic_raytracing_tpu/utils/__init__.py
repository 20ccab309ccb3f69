from .profiling import FrameTimer, TraceStats, trace_stats

__all__ = ["FrameTimer", "TraceStats", "trace_stats"]
