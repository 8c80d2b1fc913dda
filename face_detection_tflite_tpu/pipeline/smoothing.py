"""Temporal landmark smoothing for video streams.

Analog of the reference example app's `FaceSmoother`
(`example/lib/main.dart:3755`): exponential smoothing of per-track face
geometry across frames, keyed by tracking ID, so rendered overlays don't
jitter.  Purely host-side stream state, like the tracker.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .types import Detection, Face, FaceMesh, RectF

__all__ = ["FaceSmoother"]


class FaceSmoother:
    """EMA smoothing of boxes/keypoints/mesh/iris per tracking ID.

    ``alpha`` is the weight of the NEW observation (1.0 = no smoothing).
    Faces without a tracking ID pass through unsmoothed.  Tracks absent
    for ``max_missed_frames`` consecutive smoothed frames are forgotten.
    """

    def __init__(self, alpha: float = 0.5, max_missed_frames: int = 5):
        if not 0.0 < alpha <= 1.0:
            raise ValueError("alpha must be in (0, 1]")
        self.alpha = alpha
        self.max_missed_frames = max_missed_frames
        self._state: dict[int, dict] = {}
        self._missed: dict[int, int] = {}

    def _ema(self, tid: int, key: str, value: Optional[np.ndarray]):
        if value is None:
            return None
        value = np.asarray(value, np.float64)
        prev = self._state[tid].get(key)
        if prev is None or prev.shape != value.shape:
            out = value
        else:
            out = prev * (1.0 - self.alpha) + value * self.alpha
        self._state[tid][key] = out
        return out

    def smooth(self, faces: list[Face]) -> list[Face]:
        """Returns smoothed copies of ``faces`` (tracking IDs preserved)."""
        seen = set()
        out = []
        for f in faces:
            tid = f.tracking_id
            if tid is None:
                out.append(f)
                continue
            seen.add(tid)
            state = self._state.setdefault(tid, {})
            self._missed[tid] = 0

            b = f.bounding_box
            # Guard against ID reuse after detector.reset_tracking(): if the
            # stored box and the new one don't plausibly belong to the same
            # track (no overlap and far apart), restart the EMA rather than
            # blending two different faces.
            prev_box = state.get("box")
            if prev_box is not None:
                pw = max(prev_box[2] - prev_box[0], 1e-6)
                ph = max(prev_box[3] - prev_box[1], 1e-6)
                pcx = (prev_box[0] + prev_box[2]) / 2
                pcy = (prev_box[1] + prev_box[3]) / 2
                ncx, ncy = (b.xmin + b.xmax) / 2, (b.ymin + b.ymax) / 2
                diag = float(np.hypot(pw, ph))
                if float(np.hypot(ncx - pcx, ncy - pcy)) > 1.5 * diag:
                    state.clear()
            box = self._ema(tid, "box",
                            [b.xmin, b.ymin, b.xmax, b.ymax])
            kp = self._ema(tid, "kp", f.detection_data.keypoints_xy)
            mesh_pts = self._ema(
                tid, "mesh", f.mesh.points if f.mesh is not None else None)
            iris = self._ema(
                tid, "iris",
                f.iris_points if len(f.iris_points) else None)

            det = Detection(RectF(*map(float, box)),
                            f.detection_data.score, np.asarray(kp))
            mesh = (FaceMesh(mesh_pts, score=f.mesh.score)
                    if mesh_pts is not None else None)
            out.append(Face(
                detection=det, mesh=mesh,
                irises=iris if iris is not None else np.zeros((0, 3)),
                original_size=f.original_size,
                blendshape_scores=(f.blendshapes.scores
                                   if f.blendshapes is not None else None),
                tracking_id=tid))

        for tid in list(self._state):
            if tid not in seen:
                self._missed[tid] = self._missed.get(tid, 0) + 1
                if self._missed[tid] > self.max_missed_frames:
                    self._state.pop(tid, None)
                    self._missed.pop(tid, None)
        return out

    def reset(self) -> None:
        self._state.clear()
        self._missed.clear()
