"""Event-time windowing: batch window()/session_window over the
events table, plus a Structured Streaming pipeline (watermark +
windowed aggregation + stateful sessionization) over the same data.
"""
