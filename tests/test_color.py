import numpy as np
import jax.numpy as jnp

from raintpu.ops import color


def np_rgb_to_xyY(arr):
    """Independent numpy transcription of the CIE-1931 formulas used by
    the reference (my_utils.py:55-68) for golden comparison."""
    mat = np.array([[0.49, 0.31, 0.20],
                    [0.17697, 0.81240, 0.01063],
                    [0.0, 0.01, 0.99]])
    xyz = arr @ mat / 0.17697
    s = xyz.sum(-1)
    with np.errstate(invalid="ignore", divide="ignore"):
        x = xyz[..., 0] / s
        y = xyz[..., 1] / s
    out = np.stack([x, y, xyz[..., 1]], -1)
    out[np.isnan(out)] = 0
    return out


def np_xyY_to_rgb(xyY):
    x, y, Y = xyY[..., 0], xyY[..., 1], xyY[..., 2]
    X = Y * x / y
    Z = Y * (1 - x - y) / y
    mat = np.array([[0.41847, -0.15866, -0.082835],
                    [-0.091169, 0.25243, 0.015708],
                    [0.0009209, -0.0025498, 0.1786]])
    return np.stack([X, Y, Z], -1) @ mat


def test_rgb_to_xyY_matches_reference_math(rng):
    rgb = rng.rand(17, 13, 3).astype(np.float32)
    got = np.asarray(color.rgb_to_xyY(jnp.asarray(rgb)))
    want = np_rgb_to_xyY(rgb.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_black_pixels_give_zero_chromaticity():
    rgb = jnp.zeros((4, 4, 3))
    out = np.asarray(color.rgb_to_xyY(rgb))
    assert np.all(out == 0)


def test_xyY_to_rgb_matches_reference_math(rng):
    xyY = rng.rand(9, 3).astype(np.float32) * np.array([0.6, 0.6, 2.0]) + 0.1
    got = np.asarray(color.xyY_to_rgb(jnp.asarray(xyY)))
    want = np_xyY_to_rgb(xyY.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_round_trip(rng):
    rgb = rng.rand(64, 3).astype(np.float32) * 0.9 + 0.05
    back = color.xyY_to_rgb(color.rgb_to_xyY(jnp.asarray(rgb)))
    np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-3)


def test_gray_luminance_constant():
    g = 0.37
    got = color.rgb_to_xyY(jnp.full((1, 3), g))[0, 2]
    assert np.isclose(float(got), g * color.GRAY_TO_Y, atol=1e-6)


def test_xyY_basis_linearity(rng):
    x = jnp.asarray([0.3])
    y = jnp.asarray([0.35])
    base = color.xyY_basis_rgb(x, y)
    full = color.xyY_to_rgb(jnp.asarray([[0.3, 0.35, 2.5]]))
    np.testing.assert_allclose(np.asarray(2.5 * base), np.asarray(full),
                               rtol=1e-5)
