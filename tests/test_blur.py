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


def test_multirate_blur_bounded_error(rng):
    # multirate_blur_hw is NOT the production fog path (see its
    # docstring: the truncated fog kernel aliases under pooling, error
    # floor ~2-4e-2). Pin the implementation at its measured envelope
    # so the documented verdict stays true, on a smooth field and an
    # edge image, odd sizes (tail padding) included.
    from raintpu.ops.blur import multirate_blur_hw, separable_blur_hw

    k = cv2_gaussian_kernel(25, 25.0)
    smooth = np.exp(-0.05 * (rng.rand(2, 95, 311).astype(np.float32)
                             * 30 + 2))
    edges = (rng.rand(2, 95, 311) > 0.5).astype(np.float32)
    for name, x, bound in [("smooth", smooth, 0.04), ("edges", edges,
                                                      0.08)]:
        ex = np.asarray(separable_blur_hw(jnp.asarray(x), k))
        got = np.asarray(multirate_blur_hw(jnp.asarray(x), k, 4))
        err = np.abs(got - ex)
        assert err.max() < bound, (name, err.max())
        assert err.mean() < 8e-3, (name, err.mean())
    # ds=1 is exactly the full-rate blur
    got = np.asarray(multirate_blur_hw(jnp.asarray(smooth), k, 1))
    np.testing.assert_array_equal(
        got, np.asarray(separable_blur_hw(jnp.asarray(smooth), k)))


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


def test_separable_blur_production_shapes_match_cv2(rng):
    # Production-shape sizes (all dense since the round-5 pass-structure
    # finding — blur._BLOCKED_BLUR_MIN_DIM), incl. the old blocked-path
    # regression shapes and the Cityscapes envmap-feather width.
    for (h, w), (ks, sg) in [((300, 517), (25, 25.0)),
                             ((256, 256), (25, 25.0)),
                             ((90, 1242), (25, 25.0)),
                             ((64, 2613), (15, 2.6))]:
        img = rng.rand(h, w, 3).astype(np.float32)
        k = cv2_gaussian_kernel(ks, sg)
        got = np.asarray(separable_blur(jnp.asarray(img), k))
        want = cv2.GaussianBlur(img, (ks, ks), sg)
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"{h}x{w}")


def test_blocked_axis_blur_matches_cv2(rng):
    # The slab path now engages only beyond _BLOCKED_BLUR_MIN_DIM; pin
    # it directly (both axes, tail-block padding + crop, REFLECT_101).
    from raintpu.ops.blur import _blocked_axis_blur

    k = cv2_gaussian_kernel(25, 25.0)
    kk = (25, float(k[0]), float(k[12]))
    img = rng.rand(3, 90, 1242).astype(np.float32)
    got = _blocked_axis_blur(jnp.asarray(img), kk, k, -1)
    got = np.asarray(_blocked_axis_blur(got, kk, k, -2))
    for c in range(3):
        want = cv2.GaussianBlur(img[c], (25, 25), 25.0)
        np.testing.assert_allclose(got[c], want, atol=2e-5)


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


def test_separable_blur_tiny_axes_match_cv2(rng):
    """Kernel radius >= axis length: REFLECT_101 folds more than once
    (the round-5 dense band matrix originally single-folded and indexed
    out of bounds — hit by the 15-tap envmap feather on toy-scale
    envmaps, e.g. JobSpec tests at 24x48 frames)."""
    k = cv2_gaussian_kernel(15, 2.6)
    for h, w in [(6, 12), (3, 26), (2, 2), (6, 3)]:
        img = rng.rand(h, w, 3).astype(np.float32)
        got = np.asarray(separable_blur(jnp.asarray(img), k))
        want = cv2.GaussianBlur(img, (15, 15), 2.6)
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"{h}x{w}")
