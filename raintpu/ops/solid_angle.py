"""Per-pixel solid angles of a lat-long environment map.

Re-derivation of the reference's ``common/solid_angle.py`` (credited there
to J.-F. Lalonde): each pixel is split into two spherical triangles whose
solid angles are computed with L'Huillier's theorem. Unlike the reference
— which recomputes this map for every frame (``generator.py:410``) even
though it only depends on the map resolution — callers here compute it
once per resolution (it is a pure function of (H, W)) and reuse it.

Also provides :func:`pixel_directions`, the unit direction of each pixel
center under the *FOV-polygon* convention of the reference
(``bad_weather.py:570-586, 644-666``), used by the analytic drop-cone
photometry in :mod:`raintpu.ops.photometry`.
"""

from __future__ import annotations

import jax.numpy as jnp


def _latlong_dirs(u: jnp.ndarray, v: jnp.ndarray):
    """Lat-long (u, v) in [0,1]^2 -> unit XYZ (reference solid_angle.py:32-44)."""
    theta = jnp.pi * (2.0 * u - 1.0)
    phi = jnp.pi * v
    x = jnp.sin(phi) * jnp.sin(theta)
    y = jnp.cos(phi)
    z = -jnp.sin(phi) * jnp.cos(theta)
    return x, y, z


def _tetra_solid_angle(a, b, c):
    """L'Huillier solid angle of the spherical triangle (a, b, c).

    a, b, c: arrays of shape (..., 3) of unit vectors.
    """
    theta_a = jnp.arccos(jnp.clip(jnp.sum(b * c, -1), -1.0, 1.0))
    theta_b = jnp.arccos(jnp.clip(jnp.sum(a * c, -1), -1.0, 1.0))
    theta_c = jnp.arccos(jnp.clip(jnp.sum(a * b, -1), -1.0, 1.0))
    theta_s = (theta_a + theta_b + theta_c) / 2.0
    product = (jnp.tan(theta_s / 2.0)
               * jnp.tan((theta_s - theta_a) / 2.0)
               * jnp.tan((theta_s - theta_b) / 2.0)
               * jnp.tan((theta_s - theta_c) / 2.0))
    product = jnp.maximum(product, 0.0)
    return 4.0 * jnp.arctan(jnp.sqrt(product))


def solid_angle_map(height: int, width: int,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Solid angle (steradians) of each pixel of an (H, W) lat-long map.

    Sums to ~4*pi over the full map. Matches reference
    ``solid_angle.get_solid_angles`` to float tolerance.
    """
    cols = jnp.linspace(0.0, 1.0, width + 1, dtype=dtype)
    rows = jnp.linspace(0.0, 1.0, height + 1, dtype=dtype)
    u, v = jnp.meshgrid(cols, rows)
    x, y, z = _latlong_dirs(u, v)
    d = jnp.stack([x, y, z], axis=-1)  # (H+1, W+1, 3) pixel-corner dirs

    a = d[:-1, :-1]
    b = d[:-1, 1:]
    c = d[1:, :-1]
    e = d[1:, 1:]
    omega = _tetra_solid_angle(a, b, c) + _tetra_solid_angle(b, c, e)
    return omega


def pixel_directions(height: int, width: int,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Unit direction of each pixel center in the FOV-code's world frame.

    Inverts the forward mapping of ``bad_weather.py:648-664``:
      azimuth_img = ((2*pi - az) - pi/2) mod 2*pi ; u = azimuth_img/(2*pi)
      elev_img    = (el + pi/2) mod 2*pi          ; v = 1 - elev_img/pi
    where (az, el) come from cart2sph: az = atan2(y, x),
    el = atan2(z, hypot(x, y)).

    Returns (H, W, 3) unit vectors in the frame where the drop position is
    (wp_x, -wp_z_sim, wp_y_sim) — i.e. after both the parse-time z-negation
    (``bad_weather.py:223-224``) and the axis swap (``:598-599``).
    """
    u = (jnp.arange(width, dtype=dtype) + 0.5) / width
    v = (jnp.arange(height, dtype=dtype) + 0.5) / height
    uu, vv = jnp.meshgrid(u, v)
    az = jnp.mod(1.5 * jnp.pi - 2.0 * jnp.pi * uu, 2.0 * jnp.pi)
    el = (1.0 - vv) * jnp.pi - 0.5 * jnp.pi  # in [-pi/2, pi/2]
    ce = jnp.cos(el)
    return jnp.stack([ce * jnp.cos(az), ce * jnp.sin(az), jnp.sin(el)],
                     axis=-1)
