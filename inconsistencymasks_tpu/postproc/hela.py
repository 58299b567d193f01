"""HeLa position post-processing (host side).

Contour extraction and cell counting are inherently sequential, tiny, and
eval-only, so they stay on the host (SURVEY.md section 7 step 9: quarantined
off the device pipeline).  Behavioural parity with the reference:

- get_pos_contours (reference functions.py:6181-6219): erode (3x3) ->
  threshold(10) -> external+internal contours -> moment centroids shifted by
  (+1, +1).
- get_min_dist (functions.py:6222-6252): min Euclidean distance to any other
  position (0 if alone).
- mod_pos_size (functions.py:6256-6293): redraw each position as a filled
  circle of radius clamp(min_dist // 4, 3, 8), then 2x2 box blur and cut
  <254 — which trims circle edges deterministically.
- get_cell_count (functions.py:6299-6371): classify each position by
  comparing alive vs dead mass in a +-3 px window (with the reference's
  exact, slightly asymmetric, border clamping).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import cv2
import numpy as np


def get_pos_contours(img: np.ndarray, erode_kernel: int = 3
                     ) -> List[Tuple[int, int]]:
    gray = img
    if gray.ndim == 3 and gray.shape[2] > 1:
        gray = cv2.cvtColor(gray, cv2.COLOR_BGR2GRAY)
    if erode_kernel > 0:
        gray = cv2.convertScaleAbs(gray)
        gray = cv2.erode(gray, np.ones((erode_kernel, erode_kernel), "uint8"),
                         iterations=1)
    _, thresh = cv2.threshold(gray, 10, 255, 0)
    contours, _ = cv2.findContours(thresh.astype("uint8"), cv2.RETR_TREE,
                                   cv2.CHAIN_APPROX_SIMPLE)
    positions = []
    for c in contours:
        m = cv2.moments(c)
        if m["m00"] != 0:
            positions.append((int(m["m10"] / m["m00"]) + 1,
                              int(m["m01"] / m["m00"]) + 1))
    return positions


def get_min_dist(xy: Tuple[int, int],
                 positions: Sequence[Tuple[int, int]]) -> float:
    pts = np.asarray(positions, dtype=np.float64)
    d = np.linalg.norm(pts - np.asarray(xy, dtype=np.float64), axis=1)
    d = d[d > 0]
    return float(d.min()) if d.size else 0.0


def mod_pos_size(gray_img: np.ndarray, max_pos_circle_size: int = 8,
                 min_pos_circle_size: int = 3) -> np.ndarray:
    positions = get_pos_contours(gray_img)
    h, w = gray_img.shape[:2]
    out = np.zeros((h, w), np.uint8)
    for pos in positions:
        min_dist = get_min_dist(pos, positions)
        size = int(min_dist // 4)
        size = max(min(size, max_pos_circle_size), min_pos_circle_size)
        cv2.circle(out, (pos[0], pos[1]), size, 255, -1)
    out = cv2.blur(out, (2, 2))
    out[out < 254] = 0
    return out


def get_cell_count(positions: Sequence[Tuple[int, int]],
                   img_alive: np.ndarray, img_dead: np.ndarray,
                   measuring_range: int = 3) -> Tuple[int, int, int]:
    def to_gray(img):
        if img.ndim == 3 and img.shape[2] > 1:
            return cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return img.reshape(img.shape[:2])

    alive = cv2.threshold(to_gray(img_alive), 10, 255, cv2.THRESH_BINARY)[1]
    dead = cv2.threshold(to_gray(img_dead), 10, 255, cv2.THRESH_BINARY)[1]
    img_h, img_w = alive.shape

    alive_count = dead_count = unclear_count = 0
    for px, py in positions:
        x, y = px, py
        # The reference's exact border clamping (functions.py:6346-6356),
        # asymmetries included.
        if x - measuring_range <= 0:
            x += measuring_range
        if x + measuring_range > img_w:
            x = img_w - measuring_range
        if y - measuring_range < 0:
            y += measuring_range
        if y + measuring_range > img_h:
            y = img_h - measuring_range
        area_alive = alive[y - measuring_range:y + measuring_range,
                           x - measuring_range:x + measuring_range]
        area_dead = dead[y - measuring_range:y + measuring_range,
                         x - measuring_range:x + measuring_range]
        sa, sd = int(np.sum(area_alive)), int(np.sum(area_dead))
        if sa > sd:
            alive_count += 1
        elif sd > sa:
            dead_count += 1
        else:
            unclear_count += 1
    return alive_count, dead_count, unclear_count
