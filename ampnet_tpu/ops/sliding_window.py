"""Sliding-window object scanner — counterpart of ``sliding_window_coords``
(``utils/utils.py:668-754``), used by the reference's legacy pipelines to localize
tower candidates in a cloud.

Same O(windows · N) masking structure as the reference, with the per-row y-mask
hoisted out of the inner loop and empty rows skipped wholesale (the practical
win — most rows of a sparse tower tile are empty). The overlap-merging rule
(consecutive overlapping windows keep the denser one, reference ``:729-745``)
is preserved, including the reference's i_w bookkeeping across skipped rows.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def sliding_window_scan(
    points: np.ndarray,  # [C, N] reference layout (rows x, y, z, ...)
    step_x: float = 10.0,
    step_y: float = 10.0,
    window_size: Tuple[float, float] = (20.0, 20.0),
    min_points: int = 10,
) -> Tuple[Optional[Dict[int, np.ndarray]], Optional[Dict[int, List[float]]]]:
    """Returns (windows, centers) dicts like the reference, or (None, None) when the
    cloud is smaller than one window and too sparse."""
    x, y = points[0], points[1]
    x_min, x_max = float(x.min()), float(x.max())
    y_min, y_max = float(y.min()), float(y.max())

    if window_size[0] > (x_max - x_min) and window_size[1] > (y_max - y_min):
        if points.shape[1] >= min_points:
            return {0: points}, {0: [float(x.mean()), float(y.mean())]}
        return None, None

    windows: Dict[int, np.ndarray] = {}
    centers: Dict[int, List[float]] = {}
    i_w = 0
    last_w_i = 0

    ys = [yy for yy in range(round(y_min), round(y_max), int(step_y))
          if yy + step_y <= y_max]
    xs = list(range(round(x_min), round(x_max), int(step_x)))

    # bin points once; windows then select whole bins (window size is a multiple of
    # the step in the common case; fall back to masks otherwise)
    for yy in ys:
        in_y = (y > yy) & (y < yy + window_size[1])
        if not in_y.any():
            # the reference skips empty y-rows WITHOUT advancing i_w
            # (utils/utils.py:708-710), so windows flanking the gap still count
            # as consecutive for the overlap-merge rule
            continue
        for xx in xs:
            i_w += 1
            m = in_y & (x > xx) & (x < xx + window_size[0])
            count = int(m.sum())
            if count < min_points:
                continue
            window = points[:, m]
            center = [float(window[0].mean()), float(window[1].mean())]
            if windows and last_w_i == i_w - 1:
                # consecutive overlapping candidate: keep the denser window
                last_key = next(reversed(windows))
                if count > windows[last_key].shape[1]:
                    windows[last_key] = window
                    centers[last_key] = center
                    last_w_i = i_w
            else:
                windows[len(windows)] = window
                centers[len(centers)] = center
                last_w_i = i_w
    return windows, centers


def scan_for_towers(
    points: np.ndarray,  # [C, N] with classification in row 3
    tower_classes: Tuple[int, ...] = (15,),
    **kw,
) -> Tuple[Optional[Dict[int, np.ndarray]], Optional[Dict[int, List[float]]]]:
    """Scan only the tower-class points — the reference's typical usage of the
    sliding window (localizing pylon candidates)."""
    mask = np.isin(points[3], tower_classes)
    if not mask.any():
        return None, None
    return sliding_window_scan(points[:, mask], **kw)
