from .runner import run_caller, CallerConfig

__all__ = ["run_caller", "CallerConfig"]
