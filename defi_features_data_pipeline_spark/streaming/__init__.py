from .incremental import stream_append_incremental, stream_upsert_with_quarantine

__all__ = ["stream_append_incremental", "stream_upsert_with_quarantine"]
