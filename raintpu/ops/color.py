"""CIE-1931 RGB <-> xyY color conversions.

Matches the reference's conversion matrices exactly
(``common/my_utils.py:55-85``) — these are the *CIE 1931 RGB* primaries
(not sRGB), with the 1/0.17697 normalization. All functions are pure JAX
and operate on arrays with a trailing channel dimension of 3.

The key property exploited by the renderer: for a fixed chromaticity
(x, y), ``xyY_to_rgb`` is linear in Y. The drop recoloring step of the
reference (``common/bad_weather.py:399-413``) sets a uniform chromaticity
per drop and scales the per-pixel texture luminance — so a drop's RGB
patch factors as ``rgb(px) = gray(px) * luminance_gain * base_rgb(x, y)``,
which is what :func:`xyY_basis_rgb` provides.
"""

from __future__ import annotations

import jax.numpy as jnp

# XYZ_j = sum_k rgb_k * RGB2XYZ[k, j] / FACTOR  (reference my_utils.py:56-59)
RGB2XYZ = (
    (0.49000, 0.31000, 0.20000),
    (0.17697, 0.81240, 0.01063),
    (0.00000, 0.01000, 0.99000),
)
FACTOR = 0.17697

# rgb_j = sum_k XYZ_k * XYZ2RGB[k, j]  (reference my_utils.py:79)
XYZ2RGB = (
    (0.41847, -0.15866, -0.082835),
    (-0.091169, 0.25243, 0.015708),
    (0.0009209, -0.0025498, 0.1786),
)

# Luminance of a gray pixel g (r=g=b=g): Y = g * sum(RGB2XYZ[:,1]) / FACTOR.
# sum of second column = 0.31 + 0.8124 + 0.01 = 1.1324
GRAY_TO_Y = (RGB2XYZ[0][1] + RGB2XYZ[1][1] + RGB2XYZ[2][1]) / FACTOR


def rgb_to_xyY(rgb: jnp.ndarray, nan_to_zero: bool = True) -> jnp.ndarray:
    """RGB -> xyY. Shape (..., 3) -> (..., 3) with channels (x, y, Y).

    The reference computes x = X/(X+Y+Z) with divide-by-zero producing
    NaN, then replaces NaN with 0 at the call sites
    (``generator.py:408``, ``bad_weather.py:380``). With
    ``nan_to_zero=True`` (default) that replacement is fused in.
    """
    mat = jnp.asarray(RGB2XYZ, dtype=rgb.dtype)
    xyz = (rgb @ mat) / FACTOR
    s = xyz[..., 0] + xyz[..., 1] + xyz[..., 2]
    if nan_to_zero:
        safe = s != 0
        s_safe = jnp.where(safe, s, 1.0)
        x = jnp.where(safe, xyz[..., 0] / s_safe, 0.0)
        y = jnp.where(safe, xyz[..., 1] / s_safe, 0.0)
    else:
        x = xyz[..., 0] / s
        y = xyz[..., 1] / s
    return jnp.stack([x, y, xyz[..., 1]], axis=-1)


def xyY_to_rgb(xyY: jnp.ndarray) -> jnp.ndarray:
    """xyY -> RGB. Shape (..., 3) -> (..., 3). Reference my_utils.py:71-85."""
    x, y, Y = xyY[..., 0], xyY[..., 1], xyY[..., 2]
    X = (Y * x) / y
    Z = (Y * (1.0 - x - y)) / y
    mat = jnp.asarray(XYZ2RGB, dtype=xyY.dtype)
    xyz = jnp.stack([X, Y, Z], axis=-1)
    return xyz @ mat


def xyY_basis_rgb(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """RGB of chromaticity (x, y) at unit luminance: xyY_to_rgb((x, y, 1)).

    Because xyY->RGB is linear in Y, any pixel with this chromaticity and
    luminance Y has color ``Y * xyY_basis_rgb(x, y)``.
    Returns shape (..., 3) broadcast over x/y.
    """
    one = jnp.ones_like(x)
    return xyY_to_rgb(jnp.stack([x, y, one], axis=-1))
