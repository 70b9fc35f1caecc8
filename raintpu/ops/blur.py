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


def _blocked_axis_blur(x: jnp.ndarray, kernel_key, kernel: np.ndarray,
                       axis: int) -> jnp.ndarray:
    """Blur ``axis`` (-1 or -2) of (..., H, W) with overlapping block
    slabs (REFLECT_101 borders). MXU cost is ~max(2r+1, 128) MACs per
    output element instead of the dense path's n — and the contraction
    runs over the (8,128)-tiled trailing dims, so lanes stay full no
    matter how few channels the caller has (the round-4 fog finding:
    channels-LAST blurs put C=4 in the lane dim and ran ~5x off
    roofline)."""
    assert axis in (-1, -2), axis
    n = x.shape[axis]
    ksize = kernel.shape[0]
    r = (ksize - 1) // 2
    # Pick block so the slab depth (block + 2r) is the next multiple of
    # the MXU contraction tile — depth beyond 2r+1 is free until then.
    depth = -(-(2 * r + 1) // 128) * 128
    block = depth - 2 * r
    nb = -(-n // block)
    ax = x.ndim + axis

    # REFLECT_101 on the real borders, zero-pad to whole blocks (the
    # padded tail is cropped from the output).
    top = jax.lax.rev(jax.lax.slice_in_dim(x, 1, r + 1, axis=ax), (ax,))
    bot = jax.lax.rev(jax.lax.slice_in_dim(x, n - r - 1, n - 1, axis=ax),
                      (ax,))
    zshape = list(x.shape)
    zshape[ax] = nb * block - n
    xp = jnp.concatenate([top, x, bot, jnp.zeros(zshape, x.dtype)],
                         axis=ax)

    slabs = jnp.stack([jax.lax.slice_in_dim(xp, i * block,
                                            i * block + depth, axis=ax)
                       for i in range(nb)])   # (nb, ..., depth[, W])
    B = jnp.asarray(_block_band_matrix(kernel_key, kernel, block),
                    x.dtype)                  # (depth, block)
    if axis == -1:
        out = jnp.einsum("s...k,ko->s...o", slabs, B,
                         preferred_element_type=jnp.float32)
        out = jnp.moveaxis(out, 0, -2)        # (..., nb, block)
        return out.reshape(x.shape[:-1] + (nb * block,))[..., :n]
    out = jnp.einsum("s...kw,ko->s...ow", slabs, B,
                     preferred_element_type=jnp.float32)
    out = jnp.moveaxis(out, 0, -3)            # (..., nb, block, W)
    return out.reshape(x.shape[:-2]
                       + (nb * block, x.shape[-1]))[..., :n, :]


def _dense_axis_blur(x: jnp.ndarray, kernel_key, kernel: np.ndarray,
                     axis: int) -> jnp.ndarray:
    """Dense (n, n) band-matrix blur of ``axis`` (-1 or -2) — for short
    axes, and the r >= n case where REFLECT_101 folds more than once."""
    n = x.shape[axis]
    K = jnp.asarray(_blur_matrix(n, kernel_key, kernel), x.dtype)
    if axis == -1:
        return jnp.einsum("...j,oj->...o", x, K,
                          preferred_element_type=jnp.float32)
    return jnp.einsum("...jw,oj->...ow", x, K,
                      preferred_element_type=jnp.float32)


def _axis_blur(x, kernel_key, kernel, axis):
    n = x.shape[axis]
    r = (kernel.shape[0] - 1) // 2
    if n >= _BLOCKED_BLUR_MIN_DIM and r < n:
        return _blocked_axis_blur(x, kernel_key, kernel, axis)
    return _dense_axis_blur(x, kernel_key, kernel, axis)


def separable_blur_hw(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable blur of the last two axes of (..., H, W) with one
    static 1-D kernel. REFLECT_101 borders (cv2 default).

    This is the TPU-native layout: leading axes are batch/channel and
    (H, W) are the tiled dims, so the banded matmuls contract full
    (8,128) tiles. Callers with channels-last images should build the
    blur input channel-major (see ops.fog) rather than blur (H, W, C)
    with C in the lane dim.

    Long axes use overlapping block slabs (linear cost — see
    _blocked_axis_blur); short axes a dense (n, n) band matrix.
    """
    ksize = kernel.shape[0]
    kernel_key = (ksize, float(kernel[0]), float(kernel[ksize // 2]))
    out = _axis_blur(x, kernel_key, kernel, -2)
    return _axis_blur(out, kernel_key, kernel, -1)


def separable_blur(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable blur of (H, W) or (H, W, C), REFLECT_101 borders.

    Channels-last convenience wrapper over :func:`separable_blur_hw`
    (transposes to channel-major and back — fine for small maps like
    the envmap feather; hot full-res paths should call the _hw form on
    channel-major data directly)."""
    if img.ndim == 2:
        return separable_blur_hw(img, kernel)
    return jnp.moveaxis(
        separable_blur_hw(jnp.moveaxis(img, -1, 0), kernel), 0, -1)


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
