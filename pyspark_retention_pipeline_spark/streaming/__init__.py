"""Structured Streaming twins of the batch event-time operators."""

from .windows import session_stream, tumbling_stream

__all__ = ["session_stream", "tumbling_stream"]
