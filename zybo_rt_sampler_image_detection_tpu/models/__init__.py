from . import yolo, nms, detect, sort, tracking, train

__all__ = ["yolo", "nms", "detect", "sort", "tracking", "train"]
