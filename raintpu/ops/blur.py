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


# Above this edge length the blur uses overlapping block slabs with a
# (K, block) band matrix instead of a dense (n, n) one. ROUND-5
# REVISION: the round-3 blocked path was justified by MACs/px (128 vs
# n), but the fog stage is HBM-PASS-bound, not MXU-bound — the slab
# stacking materializes overlapping copies while the dense matmul reads
# the input once and writes once, and MXU FLOPs are nearly free at
# these widths. Measured on v5e (192x375x1242 fog stack, honest
# device-loop): dense 3.60 ms vs blocked 10.12; per-axis dense still
# wins at w=2613 (3.59 vs 8.00) and loses by w=3328 (4.34 vs 2.98).
# All production shapes (KITTI 1242, nuScenes 1600, Cityscapes envmap
# 2613) are dense; the blocked path remains for wider axes.
_BLOCKED_BLUR_MIN_DIM = 3073

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
        # REFLECT_101: ... 2 1 | 0 1 2 ... n-1 | n-2 n-3 ... — the
        # reflection group has period 2(n-1), so fold EXACTLY (r >= n
        # reflects more than once: tiny envmaps under the 15-tap
        # feather; single-fold indexed out of bounds).
        if n == 1:
            j = np.zeros_like(j)
        else:
            p = 2 * (n - 1)
            j = np.abs(j) % p
            j = np.where(j >= n, p - j, j)
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

    Axes up to _BLOCKED_BLUR_MIN_DIM use a dense (n, n) band matrix
    (pass-minimal: one read, one write — measured 2.8x faster than the
    slab path on v5e at production shapes); wider axes use overlapping
    block slabs (linear MXU cost).
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


_coarse_kernel_cache = {}


def _bilinear_phase_weights(ds: int):
    """Per-phase (frac, uses_left) for half-pixel-aligned bilinear
    upsampling by integer factor ds: fine i = j*ds + p sits at coarse
    coordinate u = j + (p+0.5)/ds - 0.5."""
    return [(p + 0.5) / ds - 0.5 for p in range(ds)]


def _fit_coarse_kernel(kernel_key, kernel: np.ndarray, ds: int) -> np.ndarray:
    """Least-squares coarse kernel c such that
    ``bilinear_up(conv(c, boxpool(x, ds)))`` best matches ``conv(g, x)``
    on the fine grid, for the fixed fine kernel g.

    Fitting the whole composite response (pool -> coarse conv ->
    bilinear tent) beats the naive "Gaussian of sigma/ds" coarse kernel
    because the reference fog kernel is heavily truncated (ksize 25 at
    sigma 25 is a near-box filter) and the tent/box factors reshape it.
    Solved once per (kernel, ds) in numpy; interior (border-free) fit.
    """
    key = (kernel_key, ds)
    if key in _coarse_kernel_cache:
        return _coarse_kernel_cache[key]
    g = kernel.astype(np.float64)
    r = (len(g) - 1) // 2
    rc = -(-r // ds) + 2
    m = 6 * rc + 3                      # coarse line length for the fit
    n = m * ds
    # Pooling matrix D (m, n) and interior bilinear upsample U (n, m).
    D = np.zeros((m, n))
    for j in range(m):
        D[j, j * ds:(j + 1) * ds] = 1.0 / ds
    U = np.zeros((n, m))
    for i in range(n):
        u = (i + 0.5) / ds - 0.5
        j0 = int(np.floor(u))
        wgt = u - j0
        U[i, min(max(j0, 0), m - 1)] += 1.0 - wgt
        U[i, min(max(j0 + 1, 0), m - 1)] += wgt
    # Basis responses F_t = U @ shift_t @ D for each coarse tap t.
    taps = range(-rc, rc + 1)
    basis = []
    for t in taps:
        S = np.zeros((m, m))
        j = np.arange(m)
        jj = j + t
        ok = (jj >= 0) & (jj < m)
        S[j[ok], jj[ok]] = 1.0
        basis.append(U @ S @ D)          # (n, n)
    # Target: G[o, i] = g[o - i + r]. Fit interior outputs, all inputs.
    G = np.zeros((n, n))
    oo, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = oo - ii
    inside = np.abs(d) <= r
    G[inside] = g[(d + r)[inside]]
    lo, hi = (2 * rc + 1) * ds, n - (2 * rc + 1) * ds
    A = np.stack([F[lo:hi].ravel() for F in basis], axis=1)
    b = G[lo:hi].ravel()
    c, *_ = np.linalg.lstsq(A, b, rcond=None)
    c = (c / c.sum()).astype(np.float32)
    _coarse_kernel_cache[key] = c
    return c


def _bilinear_upsample_axis(x: jnp.ndarray, ds: int, axis: int) -> jnp.ndarray:
    """Upsample ``axis`` (-1 or -2) by integer ds with half-pixel-aligned
    bilinear weights (edge-clamped) — pure elementwise/concat (no gather,
    no matmul: exact in f32 on TPU). Inverse grid of the ds-box pool."""
    assert axis in (-1, -2), axis
    m = x.shape[axis]
    ax = x.ndim + axis
    left = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=ax),
         jax.lax.slice_in_dim(x, 0, m - 1, axis=ax)], axis=ax)
    right = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, m, axis=ax),
         jax.lax.slice_in_dim(x, m - 1, m, axis=ax)], axis=ax)
    outs = []
    for f in _bilinear_phase_weights(ds):
        if f < 0.0:
            outs.append((-f) * left + (1.0 + f) * x)
        else:
            outs.append((1.0 - f) * x + f * right)
    y = jnp.stack(outs, axis=ax + 1)          # (..., m, ds[, W])
    return y.reshape(x.shape[:ax] + (m * ds,) + x.shape[ax + 1:])


def multirate_blur_hw(x: jnp.ndarray, kernel: np.ndarray,
                      ds: int) -> jnp.ndarray:
    """Separable blur of the last two axes of (..., H, W), computed at
    ds x block-reduced resolution: REFLECT_101 tail-pad to a multiple of
    ds, box-pool, blur with the LS-fitted coarse kernel
    (:func:`_fit_coarse_kernel`), bilinearly upsample, crop.

    ROUND-5 VERDICT: NOT used by production fog. The fog kernel
    (ksize 25 at sigma 25) is heavily TRUNCATED — effectively a box-25
    with strong spectral sidelobes — so pooling loses real signal: the
    measured error floor of ANY linear multirate scheme for it is
    ~1.9e-2 (ds=2) / 3.7e-2 (ds=4) on unit steps (optimal per-phase
    estimator, computed numerically), and this implementation measures
    2-5e-2 max on edge images — above the 0.03 quality bar. The
    cheap-fog win came instead from pass-structure (dense band matmuls,
    see _BLOCKED_BLUR_MIN_DIM). Box-pool aliasing plus tent-upsample
    imaging bound the approach at the few-e-2 level even for smooth
    Gaussians on rough inputs (sigma=5 ds=2 on binary noise: 3.9e-2) —
    use only where ~1e-2-scale absolute error is acceptable and ds^2
    cheapness matters. Kept + pinned in tests/test_blur.py.
    """
    if ds <= 1:
        return separable_blur_hw(x, kernel)
    h, w = x.shape[-2:]
    hp, wp = -(-h // ds) * ds, -(-w // ds) * ds
    pad = [(0, 0)] * (x.ndim - 2) + [(0, hp - h), (0, wp - w)]
    xp = jnp.pad(x, pad, mode="reflect") if (hp > h or wp > w) else x
    pooled = xp.reshape(x.shape[:-2] + (hp // ds, ds, wp // ds, ds))
    pooled = pooled.mean((-3, -1))
    ksize = kernel.shape[0]
    kernel_key = (ksize, float(kernel[0]), float(kernel[ksize // 2]))
    ck = _fit_coarse_kernel(kernel_key, kernel, ds)
    blurred = separable_blur_hw(pooled, ck)
    up = _bilinear_upsample_axis(blurred, ds, -2)
    up = _bilinear_upsample_axis(up, ds, -1)
    return up[..., :h, :w]


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
