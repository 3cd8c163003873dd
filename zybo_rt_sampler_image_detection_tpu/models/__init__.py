from . import yolo, nms, detect, sort, tracking, train, runner

__all__ = ["yolo", "nms", "detect", "sort", "tracking", "train", "runner"]
