from .incremental import stream_append_incremental

__all__ = ["stream_append_incremental"]
