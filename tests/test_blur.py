import numpy as np
import jax.numpy as jnp
import cv2
from scipy.ndimage import gaussian_filter

from raintpu.ops.blur import (cv2_gaussian_kernel, separable_blur,
                              variable_separable_blur)


def test_kernel_matches_cv2():
    for ksize, sigma in [(25, 25.0), (15, 2.6), (7, 1.0)]:
        got = cv2_gaussian_kernel(ksize, sigma)
        want = cv2.getGaussianKernel(ksize, sigma).ravel()
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_separable_blur_matches_cv2(rng):
    img = rng.rand(40, 55, 3).astype(np.float32)
    k = cv2_gaussian_kernel(15, 2.6)
    got = np.asarray(separable_blur(jnp.asarray(img), k))
    want = cv2.GaussianBlur(img, (15, 15), 2.6)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_separable_blur_2d(rng):
    img = rng.rand(30, 30).astype(np.float32)
    k = cv2_gaussian_kernel(25, 25.0)
    got = np.asarray(separable_blur(jnp.asarray(img), k))
    want = cv2.GaussianBlur(img, (25, 25), 25.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_variable_blur_matches_scipy(rng):
    n, h, w = 4, 32, 24
    patches = np.zeros((n, h, w), np.float32)
    patches[:, 8:24, 8:16] = rng.rand(n, 16, 8).astype(np.float32)
    sigmas_r = np.array([0.5, 1.0, 2.0, 2.9], np.float32)
    sigmas_c = sigmas_r / 2.0
    got = np.asarray(variable_separable_blur(
        jnp.asarray(patches), jnp.asarray(sigmas_r), jnp.asarray(sigmas_c),
        radius=12))
    for i in range(n):
        want = gaussian_filter(patches[i], [sigmas_r[i], sigmas_c[i]],
                               mode="constant")
        np.testing.assert_allclose(got[i], want, atol=1e-4,
                                   err_msg=f"item {i}")


def test_variable_blur_zero_sigma_is_identity(rng):
    patches = rng.rand(2, 16, 16).astype(np.float32)
    z = jnp.zeros((2,))
    got = np.asarray(variable_separable_blur(jnp.asarray(patches), z, z, 8))
    np.testing.assert_allclose(got, patches, atol=1e-6)


def test_separable_blur_blocked_path_matches_cv2(rng):
    # Axes >= 256 take the overlapping-block-slab matmul path
    # (blur._BLOCKED_BLUR_MIN_DIM); pin it to the cv2 oracle, including
    # non-multiple-of-block sizes (tail block padding + crop) and the
    # REFLECT_101 borders.
    for h, w in [(300, 517), (256, 256), (90, 1242)]:
        img = rng.rand(h, w, 3).astype(np.float32)
        k = cv2_gaussian_kernel(25, 25.0)
        got = np.asarray(separable_blur(jnp.asarray(img), k))
        want = cv2.GaussianBlur(img, (25, 25), 25.0)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_separable_blur_wide_axis_matches_cv2(rng):
    # Axes beyond the old 2048 dense cap (e.g. the Cityscapes full-res
    # envmap feather at W~2613) now use the blocked path too; the
    # depthwise-conv fallback was removed.
    img = rng.rand(64, 2613, 3).astype(np.float32)
    k = cv2_gaussian_kernel(15, 2.6)
    got = np.asarray(separable_blur(jnp.asarray(img), k))
    want = cv2.GaussianBlur(img, (15, 15), 2.6)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_separable_blur_hw_batched_matches_cv2(rng):
    # The channel-major form (..., H, W) — the hot fog layout: leading
    # batch/channel dims, blur over the tiled trailing dims. Pinned to
    # cv2 per slice, KITTI-shaped (H=375 blocked, W=1242 blocked).
    from raintpu.ops.blur import separable_blur_hw

    x = rng.rand(2, 4, 375, 310).astype(np.float32)
    k = cv2_gaussian_kernel(25, 25.0)
    got = np.asarray(separable_blur_hw(jnp.asarray(x), k))
    for b in range(2):
        for c in range(4):
            want = cv2.GaussianBlur(x[b, c], (25, 25), 25.0)
            np.testing.assert_allclose(got[b, c], want, atol=2e-5,
                                       err_msg=f"b={b} c={c}")
