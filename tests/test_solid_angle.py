import numpy as np
import jax.numpy as jnp

from raintpu.ops.solid_angle import (pixel_directions, solid_angle_map)


def test_total_solid_angle_is_4pi():
    sa = np.asarray(solid_angle_map(32, 64))
    assert np.isclose(sa.sum(), 4 * np.pi, rtol=1e-3)


def test_solid_angle_row_structure():
    sa = np.asarray(solid_angle_map(16, 32))
    # Constant along each row (lat-long symmetry)...
    assert np.allclose(sa, sa[:, :1], atol=1e-6)
    # ...and larger at the equator than at the poles.
    assert sa[8, 0] > sa[0, 0]
    assert sa[8, 0] > sa[-1, 0]
    # Symmetric about the equator.
    np.testing.assert_allclose(sa, sa[::-1], atol=1e-6)


def test_pixel_directions_unit_norm():
    d = np.asarray(pixel_directions(12, 24))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def _forward_uv(p):
    """Forward mapping of the reference FOV code (bad_weather.py:648-661):
    world point -> (u, v) in [0,1]^2 of the envmap."""
    x, y, z = p
    az = np.arctan2(y, x)
    if az < 0:
        az += 2 * np.pi
    el = np.arctan2(z, np.hypot(x, y))
    azimuth = ((2 * np.pi - az) - np.pi / 2) % (2 * np.pi)
    u = azimuth / (2 * np.pi)
    elevation = (el + np.pi / 2) % (2 * np.pi)
    v = 1.0 - elevation / np.pi
    return u, v


def test_pixel_directions_invert_forward_mapping(rng):
    h, w = 64, 128
    dirs = np.asarray(pixel_directions(h, w))
    for _ in range(50):
        i = rng.randint(0, h)
        j = rng.randint(0, w)
        u, v = _forward_uv(dirs[i, j])
        assert abs(u * w - (j + 0.5)) < 0.51, (i, j, u * w)
        assert abs(v * h - (i + 0.5)) < 0.51, (i, j, v * h)


def test_upper_hemisphere_is_top_half():
    # The FOV convention puts positive elevation (z > 0) in the top half.
    d = np.asarray(pixel_directions(10, 20))
    assert np.all(d[:5, :, 2] > 0)
    assert np.all(d[5:, :, 2] < 0)
