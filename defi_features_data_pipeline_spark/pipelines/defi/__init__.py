from .runner import run_pipeline

__all__ = ["run_pipeline"]
