"""Smoothed tracking: detector -> SORT -> overlay, with the reference's
confidence hysteresis and template-correlation revival fallback.

Ports the semantics of ``yolo_smooth_tracking.py``:

* conf bands: detections above ``confh`` are "valid", between ``confl`` and
  ``confh`` are "candidates" (``:279-304``);
* candidates are revived to ``confh`` when a correlation-tracked box from
  the previous frame overlaps (IoU) or matches (normalized template
  cross-correlation) (``:59-69,248-259``);
* queue-driven process loop ``process_video_track_boxes_only``
  (``:275-348``) drawing ID/conf-labelled boxes on a blank overlay and
  emitting ``(frame_no, overlay, [[x1,y1],[x2,y2],conf])``.

Template matching uses cv2 when present, else an exact NumPy
TM_CCOEFF_NORMED implementation.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .sort import Sort, iou_batch


def compute_iou(box1, box2) -> float:
    """Scalar IoU (yolo_smooth_tracking.py:26-37)."""
    return float(iou_batch(np.asarray(box1, float)[None],
                           np.asarray(box2, float)[None])[0, 0])


def extract_patch(frame: np.ndarray, box, scale: float = 1.2) -> np.ndarray:
    """Padded crop around a box (yolo_smooth_tracking.py:40-49)."""
    x1, y1, x2, y2 = map(int, box)
    w, h = x2 - x1, y2 - y1
    cx, cy = x1 + w // 2, y1 + h // 2
    nw, nh = int(w * scale), int(h * scale)
    nx1 = max(0, cx - nw // 2)
    ny1 = max(0, cy - nh // 2)
    nx2 = min(frame.shape[1], cx + nw // 2)
    ny2 = min(frame.shape[0], cy + nh // 2)
    return frame[ny1:ny2, nx1:nx2]


def _match_template_ccoeff_normed(image: np.ndarray,
                                  templ: np.ndarray) -> np.ndarray:
    """NumPy TM_CCOEFF_NORMED (sliding zero-mean normalized correlation)."""
    img = image.astype(np.float64)
    t = templ.astype(np.float64)
    if img.ndim == 3:
        img = img.mean(axis=2)
        t = t.mean(axis=2)
    th, tw = t.shape
    oh, ow = img.shape[0] - th + 1, img.shape[1] - tw + 1
    if oh <= 0 or ow <= 0:
        return np.zeros((1, 1), np.float32)
    t0 = t - t.mean()
    tnorm = np.sqrt((t0 * t0).sum())
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(img, (th, tw))
    wmean = win.mean(axis=(2, 3), keepdims=True)
    w0 = win - wmean
    num = (w0 * t0).sum(axis=(2, 3))
    den = np.sqrt((w0 * w0).sum(axis=(2, 3))) * tnorm
    out = np.where(den > 1e-12, num / np.maximum(den, 1e-12), 0.0)
    return out.astype(np.float32)


def match_template(image: np.ndarray, templ: np.ndarray) -> np.ndarray:
    if (templ.shape[0] > image.shape[0]) or (templ.shape[1] > image.shape[1]):
        templ = templ[: image.shape[0], : image.shape[1]]
    try:
        import cv2
        return cv2.matchTemplate(image, templ, cv2.TM_CCOEFF_NORMED)
    except ImportError:
        return _match_template_ccoeff_normed(image, templ)


def cross_correlation_score(prev_patch, curr_patch) -> float:
    """(yolo_smooth_tracking.py:52-56)."""
    res = match_template(curr_patch, prev_patch)
    return float(res.max()) if res.size else 0.0


def track_with_correlation(prev_frame, curr_frame, prev_box):
    """Shift a previous box by the best template-match displacement
    (yolo_smooth_tracking.py:59-69)."""
    prev_patch = extract_patch(prev_frame, prev_box)
    search = extract_patch(curr_frame, prev_box, scale=1.5)
    res = match_template(search, prev_patch)
    if res.size == 0:
        return list(prev_box), 0.0
    dy, dx = np.unravel_index(int(res.argmax()), res.shape)
    max_val = float(res.max())
    return [prev_box[0] + dx, prev_box[1] + dy,
            prev_box[2] + dx, prev_box[3] + dy], max_val


def revive_candidates(candidates: List[list], prev_detections: List[list],
                      prev_frame, frame, confh: float,
                      iou_thresh: float = 0.5,
                      corr_thresh: float = 0.8) -> None:
    """The hysteresis fallback (yolo_smooth_tracking.py:248-259): boost a
    low-confidence candidate to ``confh`` when a correlation-tracked
    previous box confirms it; otherwise mark it lost (conf 0)."""
    # the correlation track depends only on the previous box — compute
    # it once per prev, not per (candidate, prev): the sliding-window
    # template match is the most expensive step in the tracking loop
    preds = [track_with_correlation(prev_frame, frame, prev[:4])
             for prev in prev_detections]
    for cand in candidates:
        for pred_box, corr in preds:
            if (compute_iou(pred_box, cand[:4]) > iou_thresh
                    or corr > corr_thresh):
                cand[4] = confh
                break
        else:
            cand[4] = 0.0


class SmoothedTracker:
    """Single-object-stream smoothed tracking (the logic inside
    ``process_video_track_boxes_only``) as a reusable stepper."""

    def __init__(self, detector, confh: float = 0.5, confl: float = 0.1,
                 iou_thresh: float = 0.5, corr_thresh: float = 0.8,
                 max_age: int = 1, min_hits: int = 3,
                 report_coasted: bool = False):
        # max_age=1 / matched-only reporting are the reference's
        # (brittle) lifecycle defaults (sort.py:199); the opt-in
        # max_age/report_coasted survive hard detector dropouts the
        # correlation-revival path cannot see (no candidate to revive) —
        # measured at 15% hard dropouts: MOTA 0.688 -> see
        # tests/test_vision.py::test_smoothed_tracker_mota_gate
        self.detector = detector
        self.tracker = Sort(max_age=max_age, min_hits=min_hits,
                            report_coasted=report_coasted)
        self.confh, self.confl = confh, confl
        self.iou_thresh, self.corr_thresh = iou_thresh, corr_thresh
        self.prev_frame: Optional[np.ndarray] = None
        self.prev_detections: List[list] = []

    def step(self, frame: np.ndarray):
        """One frame -> (tracks (K,5) [x1,y1,x2,y2,id], dets list)."""
        detections = self.detector.get_detections(
            frame, conf_threshold=self.confl)
        return self.step_with_detections(frame, detections)

    def step_with_detections(self, frame: np.ndarray, detections):
        """The tracking half of :meth:`step`, with detections supplied by
        the caller — the batched tracker stage runs the detector once for
        K frames and feeds each frame's detections through here."""
        valid = [d for d in detections if d[4] > self.confh]
        candidates = [d for d in detections
                      if self.confl < d[4] <= self.confh]
        if not valid and candidates and self.prev_frame is not None:
            revive_candidates(candidates, self.prev_detections,
                              self.prev_frame, frame, self.confh,
                              self.iou_thresh, self.corr_thresh)
        dets = np.array(valid + candidates) if (valid or candidates) \
            else np.empty((0, 5))
        tracks = self.tracker.update(dets)
        self.prev_detections = [d for d in detections
                                if d[4] >= self.confh]
        self.prev_frame = frame.copy()
        return tracks, dets


def process_video(video_path, model_path=None, rec=True, detector=None,
                  out_path="output4.mp4", show=False, max_frames=None):
    """Offline hysteresis-only variant (yolo_smooth_tracking.py:72-170):
    draw high-confidence detections; revive candidates by correlation when
    no valid detection exists.  Requires cv2 for video IO."""
    import cv2

    if detector is None:
        from .detect import YoloDetector
        detector = YoloDetector(model_path)
    cap = cv2.VideoCapture(video_path)
    out = None
    if rec:
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) or 640
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) or 480
        fps = int(cap.get(cv2.CAP_PROP_FPS)) or 25
        out = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                              fps, (w, h))
    confh, confl = 0.7, 0.3
    prev_frame, prev_detections = None, []
    n = 0
    while cap.isOpened() and (max_frames is None or n < max_frames):
        ok, frame = cap.read()
        if not ok:
            break
        n += 1
        detections = detector.get_detections(frame, conf_threshold=confl)
        valid = [d for d in detections if d[4] > confh]
        candidates = [d for d in detections if confl < d[4] <= confh]
        if not valid and prev_frame is not None:
            revive_candidates(candidates, prev_detections, prev_frame,
                              frame, confh)
        # revived candidates were boosted in place to confh, so the
        # >= confh filter already covers them AND every `valid` entry
        # (yolo_smooth_tracking.py:260 has the same single filter)
        prev_detections = [d for d in detections if d[4] >= confh]
        prev_frame = frame.copy()
        for box in (valid or [c for c in candidates if c[4] >= confh]):
            x1, y1, x2, y2 = map(int, box[:4])
            cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 255, 0), 2)
            cv2.putText(frame, f"{box[4]:.2f}", (x1, y1 - 10),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 0), 2)
        if out is not None:
            out.write(frame)
        if show:
            cv2.imshow("Frame", frame)
            if cv2.waitKey(1) == 27:
                break
    cap.release()
    if out is not None:
        out.release()
    return n


def process_video_track(video_path, model_path=None, rec=True, detector=None,
                        out_path="output3.mp4", show=False, max_frames=None):
    """Offline SORT-tracked variant (yolo_smooth_tracking.py:173-273)."""
    import cv2

    if detector is None:
        from .detect import YoloDetector
        detector = YoloDetector(model_path)
    st = SmoothedTracker(detector, confh=0.65, confl=0.3)
    cap = cv2.VideoCapture(video_path)
    out = None
    if rec:
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) or 640
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) or 480
        fps = int(cap.get(cv2.CAP_PROP_FPS)) or 30
        out = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                              fps, (w, h))
    n = 0
    while cap.isOpened() and (max_frames is None or n < max_frames):
        ok, frame = cap.read()
        if not ok:
            break
        n += 1
        tracks, dets = st.step(frame)
        for tr in tracks:
            x1, y1, x2, y2, tid = tr.astype(int)
            cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 255, 0), 1)
            conf = 0.0
            for det in dets:
                if compute_iou([x1, y1, x2, y2], det[:4]) > 0.5:
                    conf = float(det[4])
                    break
            cv2.putText(frame, f"Conf:{conf:.2f}", (x1, y1 - 10),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 0), 2)
        if out is not None:
            out.write(frame)
        if show:
            cv2.imshow("Frame", frame)
            if cv2.waitKey(1) == 27:
                break
    cap.release()
    if out is not None:
        out.release()
    return n


def process_video_track_boxes_only(frame_queue, output_queue, stream=False,
                                   show=False, model_path=None,
                                   detector=None, max_frames=None):
    """Queue-driven tracker loop (yolo_smooth_tracking.py:275-348): consume
    (frame_number, frame), emit (frame_number, overlay, [[x1,y1],[x2,y2],
    conf]) with ID/conf-labelled boxes drawn on a blank overlay."""
    from ..utils import imaging

    if detector is None:
        from .detect import YoloDetector
        detector = YoloDetector(model_path)
    st = SmoothedTracker(detector)
    rect_conf = [[0, 0], [0, 0], 0]
    n = 0
    while max_frames is None or n < max_frames:
        try:
            frame_number, frame = frame_queue.get()
            if hasattr(frame_queue, "task_done"):
                frame_queue.task_done()
        except Exception:
            continue
        if frame is None:                        # sentinel: shut down
            break
        n += 1
        if frame.ndim == 2:
            frame = np.repeat(frame[..., None], 3, axis=-1)
        blank = np.zeros_like(frame)
        try:
            tracks, dets = st.step(frame)
            for tr in tracks:
                x1, y1, x2, y2, tid = tr.astype(int)
                imaging.rectangle(blank, (x1, y1), (x2, y2), (0, 255, 0), 2)
                conf = 0.0
                for det in dets:
                    if compute_iou([x1, y1, x2, y2], det[:4]) > 0.5:
                        conf = float(det[4])
                        break
                imaging.put_text(blank, f"ID:{int(tid)} Conf:{conf:.2f}",
                                 (x1, y1 - 10), (0, 255, 0))
                rect_conf = [[int(x1), int(y1)], [int(x2), int(y2)], conf]
            if output_queue.full():
                try:
                    output_queue.get_nowait()
                except Exception:
                    pass
            output_queue.put((frame_number, blank, rect_conf))
        except Exception as e:                    # parity: loop survives
            print(f"tracking error: {e}")
            output_queue.put((frame_number, blank, [[0, 0], [0, 0], 0]))
