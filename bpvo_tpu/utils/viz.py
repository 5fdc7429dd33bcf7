"""Visualization helpers (reference ``utils/viz.{h,cc}``: colorizeDisparity /
overlayDisparity)."""
from __future__ import annotations

import numpy as np


def colorize_disparity(D: np.ndarray, min_d: float = 0.0,
                       max_d: float = None) -> np.ndarray:
    """float disparity -> BGR uint8 jet-style colorization; invalid (<=0) black
    (reference viz.cc colorizeDisparity)."""
    import cv2
    valid = D > min_d
    if max_d is None:
        max_d = float(D[valid].max()) if valid.any() else 1.0
    norm = np.zeros_like(D, np.float32)
    norm[valid] = np.clip((D[valid] - min_d) / max(max_d - min_d, 1e-6), 0, 1)
    u8 = (norm * 255).astype(np.uint8)
    color = cv2.applyColorMap(u8, cv2.COLORMAP_JET)
    color[~valid] = 0
    return color


def overlay_disparity(image: np.ndarray, D: np.ndarray,
                      alpha: float = 0.5) -> np.ndarray:
    """Blend colorized disparity over the grayscale image
    (reference viz.cc overlayDisparity)."""
    import cv2
    color = colorize_disparity(D)
    img_u8 = image.astype(np.uint8) if image.dtype != np.uint8 else image
    if img_u8.ndim == 2:
        img_u8 = cv2.cvtColor(img_u8, cv2.COLOR_GRAY2BGR)
    return cv2.addWeighted(img_u8, 1.0 - alpha, color, alpha, 0.0)
