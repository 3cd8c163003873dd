from . import metrics, recording

__all__ = ["metrics", "recording"]
