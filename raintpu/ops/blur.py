"""Gaussian blurs: fixed-sigma separable blur and per-drop variable-sigma blur.

Two distinct blur semantics exist in the reference and both are matched:

- ``cv2.GaussianBlur(img, (K, K), sigma)`` for the fog pass
  (``add_attenuation.py:79-80``) and envmap feathering
  (``bad_weather.py:815``): a truncated kernel of *fixed* width K
  regardless of sigma, with REFLECT_101 borders. Implemented as two
  depthwise convolutions (native XLA convs — compile fast, run on the
  conv units).
- ``scipy.ndimage.gaussian_filter(patch, [s1, s2, 0])`` for per-drop
  defocus (``bad_weather.py:296``): kernel radius ``int(4*sigma+0.5)``,
  *different sigma per drop*. Implemented as two banded batched matmuls
  (one (C,H,H) and one (C,W,W) Gaussian band matrix) — the TPU-native
  form: an einsum on the MXU instead of hundreds of unrolled
  shift-multiply ops (which blow up both compile time and VPU work).
"""

from __future__ import annotations

import numpy as np
import jax
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


# At or above this edge length the blur uses overlapping block slabs
# with a (K, block) band matrix instead of a dense (n, n) one: a dense
# column-blur at KITTI width does 1242 MACs/px for 25 real taps, while
# a 128-deep slab does 128 (the MXU's minimum contraction depth) —
# ~8x less MXU work, bit-equivalent math.
_BLOCKED_BLUR_MIN_DIM = 256

_blur_matrix_cache = {}
_block_matrix_cache = {}


def _blur_matrix(n: int, kernel_key, kernel: np.ndarray) -> np.ndarray:
    """(n, n) band matrix applying the 1-D kernel with REFLECT_101
    borders: out = K @ x."""
    key = (n, kernel_key)
    if key in _blur_matrix_cache:
        return _blur_matrix_cache[key]
    r = (kernel.shape[0] - 1) // 2
    K = np.zeros((n, n), np.float32)
    i = np.arange(n)
    for k, wgt in enumerate(kernel):
        j = i - r + k
        # REFLECT_101: ... 2 1 | 0 1 2 ... n-1 | n-2 n-3 ...
        j = np.abs(j)
        j = np.where(j >= n, 2 * (n - 1) - j, j)
        np.add.at(K, (i, j), wgt)
    _blur_matrix_cache[key] = K
    return K


def _block_band_matrix(kernel_key, kernel: np.ndarray,
                       block: int) -> np.ndarray:
    """(block + 2r, block) band matrix: column o holds the kernel taps
    for output o of a slab that starts r inputs before output 0."""
    key = (block, kernel_key)
    if key in _block_matrix_cache:
        return _block_matrix_cache[key]
    ksize = kernel.shape[0]
    B = np.zeros((block + ksize - 1, block), np.float32)
    for t, wgt in enumerate(kernel):
        B[np.arange(block) + t, np.arange(block)] = wgt
    _block_matrix_cache[key] = B
    return B


def _blocked_axis_blur(img: jnp.ndarray, kernel_key,
                       kernel: np.ndarray) -> jnp.ndarray:
    """Blur the LEADING axis of (n, ...) with overlapping block slabs
    (REFLECT_101 borders). MXU cost is ~max(2r+1, 128) MACs per output
    element instead of the dense path's n."""
    n = img.shape[0]
    ksize = kernel.shape[0]
    r = (ksize - 1) // 2
    # Pick block so the slab depth (block + 2r) is the next multiple of
    # the MXU contraction tile — depth beyond 2r+1 is free until then.
    depth = -(-(2 * r + 1) // 128) * 128
    block = depth - 2 * r
    nb = -(-n // block)

    # REFLECT_101 on the real borders, zero-pad to whole blocks (the
    # padded tail is cropped from the output).
    top = img[1:r + 1][::-1]
    bot = img[n - r - 1:n - 1][::-1]
    pad_tail = nb * block - n
    tail_zeros = jnp.zeros((pad_tail,) + img.shape[1:], img.dtype)
    x = jnp.concatenate([top, img, bot, tail_zeros], axis=0)

    slabs = jnp.stack([jax.lax.slice_in_dim(x, i * block,
                                            i * block + depth, axis=0)
                       for i in range(nb)])          # (nb, depth, ...)
    B = jnp.asarray(_block_band_matrix(kernel_key, kernel, block),
                    img.dtype)                       # (depth, block)
    out = jnp.einsum("bk...,ko->bo...", slabs, B,
                     preferred_element_type=jnp.float32)
    return out.reshape((nb * block,) + img.shape[1:])[:n]


def separable_blur(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable blur of (H, W) or (H, W, C) with one static 1-D kernel.

    Borders are REFLECT_101 (cv2 default). Implemented as banded
    matmuls (exact; MXU) — small-channel depthwise convs run on the VPU
    at a fraction of peak and dominated the fog pass. Long axes use
    overlapping block slabs (see _blocked_axis_blur); short axes a
    dense (n, n) band matrix.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    ksize = kernel.shape[0]
    r = (ksize - 1) // 2
    kernel_key = (ksize, float(kernel[0]), float(kernel[ksize // 2]))

    # Per-axis: block slabs for long axes (linear cost — no size cap
    # needed; the old depthwise-conv fallback for >2048-px axes ran on
    # the VPU at a fraction of peak), dense band matrix for short ones
    # (also the r >= n case, where REFLECT_101 folds more than once).
    if h >= _BLOCKED_BLUR_MIN_DIM and r < h:
        out = _blocked_axis_blur(img, kernel_key, kernel)
    else:
        kh = jnp.asarray(_blur_matrix(h, kernel_key, kernel),
                         img.dtype)
        out = jnp.einsum("ij,jwc->iwc", kh, img,
                         preferred_element_type=jnp.float32)
    if w >= _BLOCKED_BLUR_MIN_DIM and r < w:
        out = _blocked_axis_blur(out.transpose(1, 0, 2), kernel_key,
                                 kernel).transpose(1, 0, 2)
    else:
        kw = jnp.asarray(_blur_matrix(w, kernel_key, kernel),
                         img.dtype)
        out = jnp.einsum("hjc,wj->hwc", out, kw,
                         preferred_element_type=jnp.float32)
    return out[..., 0] if squeeze else out


def _band_matrix(sigma: jnp.ndarray, size: int, radius: int) -> jnp.ndarray:
    """Per-item Gaussian band matrix (N, size, size).

    Row i holds the scipy-compatible taps centered at i: truncated at
    min(radius, int(4*sigma+0.5)), normalized by the FULL kernel mass
    (so border rows lose mass exactly like zero-padded convolution).
    """
    sigma = jnp.maximum(sigma, 1e-6)
    idx = jnp.arange(size, dtype=jnp.float32)
    d = idx[None, :] - idx[:, None]                     # (size, size) k - i
    item_radius = jnp.minimum(jnp.floor(4.0 * sigma + 0.5), float(radius))
    w = jnp.exp(-(d[None] ** 2) / (2.0 * sigma[:, None, None] ** 2))
    w = jnp.where(jnp.abs(d)[None] <= item_radius[:, None, None], w, 0.0)
    # Full-kernel normalizer (independent of position): sum over taps
    # |k| <= item_radius of exp(-k^2/2s^2).
    k = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    full = jnp.exp(-(k[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    full = jnp.where(jnp.abs(k)[None, :] <= item_radius[:, None], full, 0.0)
    norm = jnp.sum(full, axis=-1)                        # (N,)
    return w / norm[:, None, None]


def variable_separable_blur(patches: jnp.ndarray,
                            sigma_rows: jnp.ndarray,
                            sigma_cols: jnp.ndarray,
                            radius: int) -> jnp.ndarray:
    """Blur a batch of patches, each with its own (row, col) sigmas.

    patches: (N, H, W); sigma_rows/sigma_cols: (N,). ``radius`` is the
    static maximum kernel radius; per-item sigmas larger than radius/4
    are effectively clamped (their tails truncate at ``radius``).

    Zero padding semantics: drop patches carry a zero margin at least
    as wide as the blur support (the reference pads with
    ``copyMakeBorder(..., 0)`` of 10*sigma, ``bad_weather.py:293-295``),
    so border handling cannot influence content.
    """
    n, h, w = patches.shape
    wr = _band_matrix(sigma_rows, h, radius)             # (N, H, H)
    out = jnp.einsum("nik,nkj->nij", wr, patches,
                     preferred_element_type=jnp.float32)
    wc = _band_matrix(sigma_cols, w, radius)             # (N, W, W)
    return jnp.einsum("njk,nik->nij", wc, out,
                      preferred_element_type=jnp.float32)
