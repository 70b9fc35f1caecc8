"""Gaussian blurs: fixed-sigma separable blur and per-drop variable-sigma blur.

Two distinct blur semantics exist in the reference and both are matched:

- ``cv2.GaussianBlur(img, (K, K), sigma)`` for the fog pass
  (``add_attenuation.py:79-80``) and envmap feathering
  (``bad_weather.py:815``): a truncated kernel of *fixed* width K
  regardless of sigma, with REFLECT_101 borders.
- ``scipy.ndimage.gaussian_filter(patch, [s1, s2, 0])`` for per-drop
  defocus (``bad_weather.py:296``): kernel radius ``int(4*sigma + 0.5)``.
  Per-drop sigma means a *batched, per-item-kernel* separable convolution
  here (:func:`variable_separable_blur`), the TPU-native replacement for
  blurring each drop patch individually on host.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def cv2_gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    """1-D Gaussian kernel identical to ``cv2.getGaussianKernel``.

    For sigma <= 0 cv2 derives sigma from ksize; we require sigma > 0.
    """
    assert sigma > 0 and ksize % 2 == 1
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def separable_blur(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable blur of (H, W) or (H, W, C) with one static 1-D kernel.

    Borders are REFLECT_101 (cv2 default; jnp.pad mode='reflect').
    Implemented as two dense 1-D convolutions via dot products along
    unrolled taps — XLA fuses this into a small number of vector ops and
    it maps cleanly onto the VPU (no gather).
    """
    k = jnp.asarray(kernel, dtype=img.dtype)
    r = (kernel.shape[0] - 1) // 2
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]

    # Rows (axis 0)
    p = jnp.pad(img, ((r, r), (0, 0), (0, 0)), mode="reflect")
    out = jnp.zeros_like(img)
    for i in range(kernel.shape[0]):
        out = out + k[i] * p[i:i + img.shape[0]]
    # Cols (axis 1)
    p = jnp.pad(out, ((0, 0), (r, r), (0, 0)), mode="reflect")
    out = jnp.zeros_like(img)
    for i in range(kernel.shape[0]):
        out = out + k[i] * p[:, i:i + img.shape[1]]

    return out[..., 0] if squeeze else out


def _scipy_taps(sigma: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Per-item scipy-compatible Gaussian taps.

    sigma: (N,) — per-item sigma. Returns (N, 2*radius+1) weights where
    taps beyond each item's own truncation radius int(4*sigma + 0.5) are
    zero, matching ``scipy.ndimage.gaussian_filter`` truncate=4.0.
    """
    sigma = jnp.maximum(sigma, 1e-6)
    k = jnp.arange(-radius, radius + 1, dtype=sigma.dtype)  # (K,)
    w = jnp.exp(-(k[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    item_radius = jnp.floor(4.0 * sigma + 0.5)
    w = jnp.where(jnp.abs(k)[None, :] <= item_radius[:, None], w, 0.0)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def variable_separable_blur(patches: jnp.ndarray,
                            sigma_rows: jnp.ndarray,
                            sigma_cols: jnp.ndarray,
                            radius: int) -> jnp.ndarray:
    """Blur a batch of patches, each with its own (row, col) sigmas.

    patches: (N, H, W); sigma_rows/sigma_cols: (N,). ``radius`` is the
    static maximum kernel radius; per-item sigmas larger than radius/4
    are effectively clamped (their tails are truncated at ``radius``).

    Zero padding is used: drop patches are rasterized with a zero margin
    at least as wide as the blur support (the reference pads with
    ``copyMakeBorder(..., BORDER_CONSTANT, 0)`` of 10*sigma,
    ``bad_weather.py:293-295``), so border mode cannot influence content.
    """
    wr = _scipy_taps(sigma_rows, radius)  # (N, K)
    wc = _scipy_taps(sigma_cols, radius)
    n, h, w = patches.shape

    p = jnp.pad(patches, ((0, 0), (radius, radius), (0, 0)))
    out = jnp.zeros_like(patches)
    for i in range(2 * radius + 1):
        out = out + wr[:, i, None, None] * p[:, i:i + h, :]
    p = jnp.pad(out, ((0, 0), (0, 0), (radius, radius)))
    out = jnp.zeros_like(patches)
    for i in range(2 * radius + 1):
        out = out + wc[:, i, None, None] * p[:, :, i:i + w]
    return out
