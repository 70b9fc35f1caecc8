"""Depth-map smoothing preprocessor (reference ``scripts/smooth_depth.py``).

Estimated/LiDAR-projected depth maps are noisy; the renderer's fog pass
amplifies high-frequency depth noise. This tool Gaussian-smooths depth
maps and (optionally) pushes textureless far-field patches to a 300 m
far plane — useful when depth estimation returns garbage for sky.
Vectorized (the reference uses a Python window loop); saves ``.npy``
depth in meters, which the render pipeline loads directly.

Usage:
    python -m raintpu.tools.smooth_depth IMAGES DEPTH OUT
"""

from __future__ import annotations

import argparse
import os

import numpy as np

FAR_PLANE_M = 300.0


def improve_depth(gray: np.ndarray, depth: np.ndarray,
                  threshold: float = 0.001,
                  threshold_faraway_planes: bool = False,
                  window: int = 20) -> np.ndarray:
    """Smooth one depth map; optionally far-plane flat patches.

    A patch whose image-intensity std is below ``threshold`` carries no
    texture — for *offline-estimated* depth that usually means no valid
    measurement (too far); those windows are set to the far plane.
    """
    import cv2

    depth = depth.astype(np.float32).copy()
    if threshold_faraway_planes:
        h, w = gray.shape[:2]
        step = max(window // 5, 1)
        # Vectorized local std via box filters.
        g = gray.astype(np.float32)
        k = (window, window)
        mean = cv2.boxFilter(g, -1, k)
        sq = cv2.boxFilter(g * g, -1, k)
        std = np.sqrt(np.maximum(sq - mean * mean, 0.0))
        flat = std < threshold
        for y in range(0, h - window, step):
            for x in range(0, w - window, step):
                if flat[y + window // 2, x + window // 2]:
                    depth[y:y + window, x:x + window] = FAR_PLANE_M
    return cv2.GaussianBlur(depth, (7, 7), 1)


def process_all(images_path: str, depth_path: str, output_path: str,
                threshold: float = 0.0,
                threshold_faraway_planes: bool = False) -> int:
    from PIL import Image

    from raintpu.utils.logging import natural_listdir, progress_bar

    os.makedirs(output_path, exist_ok=True)
    img_names = natural_listdir(images_path)
    depth_names = natural_listdir(depth_path)
    for i, (img_f, dep_f) in enumerate(zip(img_names, depth_names)):
        progress_bar(i + 1, len(img_names))
        gray = np.asarray(Image.open(
            os.path.join(images_path, img_f)).convert("L"))
        depth16 = np.asarray(Image.open(os.path.join(depth_path, dep_f)))
        depth = depth16.astype(np.float32) / 256.0  # meters
        smooth = improve_depth(gray, depth, threshold,
                               threshold_faraway_planes)
        np.save(os.path.join(output_path, img_f), smooth)
    return len(img_names)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("images")
    ap.add_argument("depth")
    ap.add_argument("output")
    ap.add_argument("--threshold", type=float, default=0.0)
    ap.add_argument("--far_planes", action="store_true")
    args = ap.parse_args(argv)
    n = process_all(args.images, args.depth, args.output,
                    args.threshold, args.far_planes)
    print(f"\nProcessed {n} depth maps -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
