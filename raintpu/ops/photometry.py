"""Per-drop environment lighting: spherical-cone FOV photometry.

The reference approximates each drop's 165-degree field of view by a
20-gon polygon on the lat-long envmap (``FovComputation``,
``bad_weather.py:596-704``), clips it with pyclipper, rasterizes a mask
with cv2.fillConvexPoly, and reduces the envmap under the mask
(``bad_weather.py:363-409``) — per drop, on host.

TPU-native redesign: the polygon is a discretization of an *exact*
geometric region — envmap pixels whose sphere point P = R*d lies inside
the cone with apex at the drop position p, axis n = p/|p| (camera at
origin), half-angle fov/2. The inside test is

    s = dot(P - p, n) >= cos(fov/2) * |P - p|,

which is algebraic in two Gram products D @ n^T and D @ p^T (D = pixel
directions). Those are matmuls over all (drop, pixel) pairs, and the
masked solid-angle-weighted reductions are one more matmul — all MXU
work, batched over every drop of a frame at once. The N->inf limit of
the reference's 20-gon (difference is a sub-pixel boundary band).

To bound cost the envmap features can be block-reduced (``downsample``):
solid-angle weights are *summed* per block so the integrals are
preserved; only the inside test is evaluated at block centers.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from raintpu.ops import color as color_ops
from raintpu.ops.solid_angle import pixel_directions, solid_angle_map


@dataclasses.dataclass
class EnvFeatures:
    """Precomputed per-frame envmap reduction features.

    feats: (Q, 4) columns = [x*sa, y*sa, Y*sa, sa] per (block of) pixel(s).
    dirs:  (Q, 3) unit direction of each block center.
    total_sa: scalar — sum of solid angles over the full map.
    ambient_lum: scalar — sum(Y*sa)/sum(sa) (reference bad_weather.py:403-404).
    """

    feats: jnp.ndarray
    dirs: jnp.ndarray
    total_sa: jnp.ndarray
    ambient_lum: jnp.ndarray


def env_features(env_map_rgb: jnp.ndarray,
                 downsample: int = 4) -> EnvFeatures:
    """Build reduction features from an RGB envmap (H, W, 3).

    The solid-angle map depends only on (H, W) and is built here from
    closed form (the reference recomputes it per frame at
    ``generator.py:410``; under jit it constant-folds per shape).
    """
    h, w, _ = env_map_rgb.shape
    xyY = color_ops.rgb_to_xyY(env_map_rgb)
    sa = solid_angle_map(h, w, dtype=env_map_rgb.dtype)
    dirs = pixel_directions(h, w, dtype=env_map_rgb.dtype)

    total_sa = jnp.sum(sa)
    ambient = jnp.sum(xyY[..., 2] * sa) / total_sa

    feats = jnp.concatenate([xyY * sa[..., None], sa[..., None, ]], axis=-1)
    if downsample > 1:
        hq = (h // downsample) * downsample
        wq = (w // downsample) * downsample
        # Sum features over blocks (preserves integrals); average dirs.
        f = feats[:hq, :wq].reshape(hq // downsample, downsample,
                                    wq // downsample, downsample, 4)
        feats_ds = f.sum(axis=(1, 3))
        d = dirs[:hq, :wq].reshape(hq // downsample, downsample,
                                   wq // downsample, downsample, 3)
        dirs_ds = d.mean(axis=(1, 3))
        dirs_ds = dirs_ds / jnp.linalg.norm(dirs_ds, axis=-1, keepdims=True)
        # Residual rows/cols are folded into totals only (tiny sliver).
        feats = feats_ds.reshape(-1, 4)
        dirs = dirs_ds.reshape(-1, 3)
    else:
        feats = feats.reshape(-1, 4)
        dirs = dirs.reshape(-1, 3)

    return EnvFeatures(feats=feats, dirs=dirs, total_sa=total_sa,
                       ambient_lum=ambient)


def swap_yz(p: jnp.ndarray) -> jnp.ndarray:
    """Axis swap applied by the reference before FOV math
    (``bad_weather.py:598-599``): (x, y, z) -> (x, z, y)."""
    return jnp.stack([p[..., 0], p[..., 2], p[..., 1]], axis=-1)


# Largest (Q pixels x N drops) cone-mask intermediate materialized at
# once. The mask feeds a matmul, so XLA materializes it in HBM: at the
# nuScenes 6-cam rig (Q ~ 138k, N = 5248, B = 6) an unchunked mask is
# ~17 GB > HBM — the round-2 "full-rig compile wall" (the remote
# compile helper died allocating it; B=3 at 8.7 GB fit, matching the
# observed boundary exactly). Chunking the drop axis bounds it.
MAX_MASK_ELEMS = 16_000_000
_FOV_CHUNK = 256


def _cone_sums(p: jnp.ndarray, n: jnp.ndarray, env: EnvFeatures,
               cos_t, R) -> jnp.ndarray:
    """Per-drop masked feature sums [x*sa, y*sa, Y*sa, sa] (N, 4).

    Deliberately NOT expressed with dots: a K=3 Gram "matmul" gains
    nothing on the MXU, and dot operands/outputs force XLA to
    materialize the (Q, N) planes in HBM — ~230 MB of round-trips per
    frame at the headline config, the dominant cost of the whole prep
    stage. As broadcasted elementwise products feeding one reduction,
    the entire cone test fuses into a single XLA reduce fusion whose
    only HBM traffic is the (Q, 3)/(Q, 4) inputs and the (N, 4) output
    (~1 MB): the (Q, N) mask never exists in memory.
    """
    # s[q, i]   = dot(R*d_q - p_i, n_i) = R * (D . n_i) - p_i . n_i
    # w2[q, i]  = |R*d_q - p_i|^2 = R^2 - 2R*(D . p_i) + |p_i|^2
    d0, d1, d2 = (env.dirs[:, k][:, None] for k in range(3))   # (Q, 1)
    Dn = d0 * n[None, :, 0] + d1 * n[None, :, 1] + d2 * n[None, :, 2]
    Dp = d0 * p[None, :, 0] + d1 * p[None, :, 1] + d2 * p[None, :, 2]
    s = R * Dn - jnp.sum(p * n, axis=-1)[None, :]
    w2 = R * R - 2.0 * R * Dp + jnp.sum(p * p, axis=-1)[None, :]
    inside = (s >= 0) & (s * s >= (cos_t * cos_t) * w2)
    # (Q, N, 1) * (Q, 1, 4) summed over Q — a reduce fusion, not a dot.
    contribs = jnp.where(inside[:, :, None], env.feats[:, None, :], 0.0)
    return jnp.sum(contribs, axis=0)


def drop_fov_stats(world_pos: jnp.ndarray,
                   env: EnvFeatures,
                   *,
                   sphere_radius: float = 10.0,
                   fov_deg: float = 165.0) -> Tuple[jnp.ndarray, ...]:
    """Masked envmap reductions for a batch of drops.

    world_pos: (N, 3) mid-streak world positions in the *parsed* frame
    (z already negated); the FOV axis swap is applied here.

    Returns (fov_xy_avg (N,2), avg_fov_lum (N,), in_fov_frac (N,)):
      fov_xy_avg  — solid-angle-weighted mean chromaticity inside the cone
                    (reference bad_weather.py:393-397)
      avg_fov_lum — sum(Y*sa inside) / sum(sa over FULL map)
                    (reference bad_weather.py:407 — note full-map divisor)
    """
    import jax

    p = swap_yz(world_pos)                        # (N, 3)
    norm = jnp.linalg.norm(p, axis=-1, keepdims=True)
    n = p / jnp.maximum(norm, 1e-12)              # cone axis per drop

    cos_t = jnp.cos(jnp.deg2rad(fov_deg / 2.0)).astype(p.dtype)
    R = jnp.asarray(sphere_radius, p.dtype)

    n_drops = p.shape[0]
    q = env.dirs.shape[0]
    if q * n_drops <= MAX_MASK_ELEMS or n_drops <= _FOV_CHUNK:
        sums = _cone_sums(p, n, env, cos_t, R)
    else:
        # Chunk the drop axis: same FLOPs, bounded mask (see
        # MAX_MASK_ELEMS). lax.map keeps one chunk in flight (and one
        # per vmapped frame when batched).
        pad = (-n_drops) % _FOV_CHUNK
        p_c = jnp.pad(p, ((0, pad), (0, 0))).reshape(
            -1, _FOV_CHUNK, 3)
        n_c = jnp.pad(n, ((0, pad), (0, 0))).reshape(
            -1, _FOV_CHUNK, 3)
        sums = jax.lax.map(
            lambda pn: _cone_sums(pn[0], pn[1], env, cos_t, R),
            (p_c, n_c))
        sums = sums.reshape(-1, 4)[:n_drops]

    # Degenerate drops (zero world position, or a cone that misses the
    # map) have no coverage; the reference skips such drops via its
    # per-drop exception trap (generator.py:185-189). Neutral
    # chromaticity + zero luminance renders them invisibly instead.
    covered = sums[:, 3] > 1e-9
    sa_in = jnp.where(covered, sums[:, 3], 1.0)
    fov_xy_avg = jnp.where(covered[:, None],
                           sums[:, :2] / sa_in[:, None], 1.0 / 3.0)
    avg_fov_lum = jnp.where(covered, sums[:, 2] / env.total_sa, 0.0)
    return fov_xy_avg, avg_fov_lum, sums[:, 3] / env.total_sa


def drop_colors(world_pos: jnp.ndarray,
                env: EnvFeatures,
                *,
                sphere_radius: float = 10.0,
                fov_deg: float = 165.0,
                irrad_type: str = "ambient") -> jnp.ndarray:
    """Uniform per-drop RGB gain vectors.

    The reference recolors each drop patch as xyY->RGB of
    (x_avg, y_avg, Y_tex(px) * drop_Y) (``bad_weather.py:399-413``) with
    drop_Y = 0.94*avg_fov_lum + 0.06*ambient_lum. Since xyY->RGB is
    linear in Y and Y_tex = GRAY_TO_Y * gray, the whole patch color is
    ``gray(px) * gain`` with the (N, 3) ``gain`` returned here.
    """
    fov_xy, fov_lum, _ = drop_fov_stats(
        world_pos, env, sphere_radius=sphere_radius, fov_deg=fov_deg)
    # Guard y ~ 0 (an all-black cone region averages to xy = (0, 0)):
    # the basis divides by y; fall back to the neutral point.
    bad = fov_xy[:, 1] < 1e-6
    fx = jnp.where(bad, 1.0 / 3.0, fov_xy[:, 0])
    fy = jnp.where(bad, 1.0 / 3.0, fov_xy[:, 1])
    base = color_ops.xyY_basis_rgb(fx, fy)                      # (N, 3)
    if irrad_type == "ambient":
        drop_Y = 0.94 * fov_lum + 0.06 * env.ambient_lum
    else:  # 'garg' — reference leaves luminance unscaled (generator.py:283)
        drop_Y = jnp.ones_like(fov_lum)
    return base * (color_ops.GRAY_TO_Y * drop_Y)[:, None]
