"""Global motion compensation for BoT-SORT (camera motion between frames).

Capability parity with reference trackers/utils/gmc.py (GMC:44 — orb / sift /
ecc / sparseOptFlow methods with downscale). Host-side cv2.
"""

from __future__ import annotations

import cv2
import numpy as np


class GMC:
    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, downscale)
        self.prev_frame = None
        self.prev_kpts = None
        self.initialized = False
        if method in {"orb", "sift"}:
            self.detector = cv2.ORB_create(3000) if method == "orb" else cv2.SIFT_create()
            self.matcher = cv2.BFMatcher(cv2.NORM_HAMMING if method == "orb" else cv2.NORM_L2)
        elif method == "ecc":
            self.warp_mode = cv2.MOTION_EUCLIDEAN
            self.criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-6)

    def apply(self, frame: np.ndarray) -> np.ndarray:
        """Estimate the 2x3 affine warp from previous to current frame."""
        if self.method in {"none", None}:
            return np.eye(2, 3)
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY) if frame.ndim == 3 else frame
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale,
                                     gray.shape[0] // self.downscale))
        H = np.eye(2, 3)
        if not self.initialized:
            self.prev_frame = gray.copy()
            self.initialized = True
            return H
        try:
            if self.method == "sparseOptFlow":
                p0 = cv2.goodFeaturesToTrack(self.prev_frame, maxCorners=1000,
                                             qualityLevel=0.01, minDistance=1, blockSize=3)
                if p0 is not None and len(p0) >= 4:
                    p1, st, _ = cv2.calcOpticalFlowPyrLK(self.prev_frame, gray, p0, None)
                    good0 = p0[st.flatten() == 1]
                    good1 = p1[st.flatten() == 1]
                    if len(good0) >= 4:
                        M, _ = cv2.estimateAffinePartial2D(good0, good1, method=cv2.RANSAC)
                        if M is not None:
                            H = M
            elif self.method == "ecc":
                warp = np.eye(2, 3, dtype=np.float32)
                _, warp = cv2.findTransformECC(self.prev_frame, gray, warp,
                                               self.warp_mode, self.criteria)
                H = warp
            elif self.method in {"orb", "sift"}:
                k0, d0 = self.detector.detectAndCompute(self.prev_frame, None)
                k1, d1 = self.detector.detectAndCompute(gray, None)
                if d0 is not None and d1 is not None and len(k0) >= 4 and len(k1) >= 4:
                    matches = sorted(self.matcher.match(d0, d1), key=lambda m: m.distance)
                    matches = matches[: max(4, len(matches) // 2)]
                    if len(matches) >= 4:
                        src = np.float32([k0[m.queryIdx].pt for m in matches])
                        dst = np.float32([k1[m.trainIdx].pt for m in matches])
                        M, _ = cv2.estimateAffinePartial2D(src, dst, method=cv2.RANSAC)
                        if M is not None:
                            H = M
        except cv2.error:
            pass
        self.prev_frame = gray.copy()
        if self.downscale > 1:
            H = H.copy()
            H[:, 2] *= self.downscale
        return H
