"""Minimal imutils shim: rotate_bound, as used by the reference
(/root/reference/common/generator.py:163). Standard expand-canvas
clockwise rotation (matches imutils.convenience.rotate_bound)."""

import cv2
import numpy as np


def rotate_bound(image, angle):
    (h, w) = image.shape[:2]
    (c_x, c_y) = (w // 2, h // 2)
    m = cv2.getRotationMatrix2D((c_x, c_y), -angle, 1.0)
    cos = np.abs(m[0, 0])
    sin = np.abs(m[0, 1])
    n_w = int((h * sin) + (w * cos))
    n_h = int((h * cos) + (w * sin))
    m[0, 2] += (n_w / 2) - c_x
    m[1, 2] += (n_h / 2) - c_y
    return cv2.warpAffine(image, m, (n_w, n_h))
