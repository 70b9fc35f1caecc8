"""Single-image environment-map extrapolation (Cameron 2005 style).

TPU-native redesign of the reference's ``EnvironmentMapGenerator``
(``common/bad_weather.py:707-853``). The reference *scatters* image pixels
into a cylindrical canvas (with ``np.unique`` dedup), fills holes with
per-column nearest-valid-row copies, mirror-extends left/right, and
feathers uncovered pixels with a 15x15 blur. Scatter + hole filling is
gather-unfriendly on TPU; here the identical mapping is inverted so the
whole map is ONE gather:

- target (row R, col C) of the cylindrical canvas maps back to source
  pixel via dc = f*tan((C + min_x - cx)/f), dr = (R - cy)*sqrt(dc^2+f^2)/f;
- the reference's top/bottom hole-filling copies, per column, the first
  (resp. last) covered row — which is exactly *clamping the source row* to
  [0, H-1] since dr is monotone in R;
- mirror extension becomes column-index arithmetic;
- the final masked 15x15 feather ("result + ((blur-result) & ~mask)",
  ``bad_weather.py:814-817``) becomes where(covered, value, blur(value)).

All shapes are static given (H, W, focal), so the whole thing jits into a
single fused gather + blur. The reference's uint8 round-trip
(``:744,819``) is intentionally skipped (pure float pipeline; <=1/255
deviation).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from raintpu.ops.blur import cv2_gaussian_kernel, separable_blur

FEATHER_KSIZE = 15
# cv2.GaussianBlur(..., (15,15), 0) derives sigma = 0.3*((15-1)*0.5 - 1) + 0.8
FEATHER_SIGMA = 0.3 * ((FEATHER_KSIZE - 1) * 0.5 - 1.0) + 0.8


@dataclasses.dataclass(frozen=True)
class EnvmapGeometry:
    """Static geometry of the envmap for a given (H, W, focal_mm)."""

    height: int          # = image height
    width: int           # source image width
    focal_env: int       # reference: int((focal_mm / 12.7) * width)
    cyl_width: int       # int(max_x - min_x) + 1
    min_x: int
    border: int          # cyl_width // 2 mirrored on each side

    @property
    def env_width(self) -> int:
        return self.cyl_width + 2 * self.border

    @property
    def env_shape(self):
        return (self.height, self.env_width)


def envmap_geometry(height: int, width: int, focal_mm: float) -> EnvmapGeometry:
    """Compute static envmap dims. Reference ``bad_weather.py:712,730-749``.

    Note the reference computes ``focal = int(((f*1000)/12.7)*W)`` with f in
    meters — i.e. ``(focal_mm/12.7)*W`` truncated to int.
    """
    focal_env = int((focal_mm / 12.7) * width)
    cx = width // 2
    max_x = round(focal_env * math.atan(cx / focal_env) + cx)
    min_x = round(focal_env * math.atan(-cx / focal_env) + cx)
    cyl_width = int(max_x - min_x) + 1
    return EnvmapGeometry(
        height=height, width=width, focal_env=focal_env,
        cyl_width=cyl_width, min_x=int(min_x), border=cyl_width // 2)


def _source_indices(geom: EnvmapGeometry, dtype=jnp.float32):
    """Per-envmap-pixel source coords + coverage mask.

    Returns (src_r, src_c, covered), each (H, W_env) with int32 indices
    clamped in-bounds.
    """
    h, w = geom.height, geom.width
    cx, cy = w // 2, h // 2
    f = float(geom.focal_env)

    # Column map through mirror extension -> cylinder column.
    c_total = jnp.arange(geom.env_width)
    b, wc = geom.border, geom.cyl_width
    cyl_col = jnp.where(
        c_total < b, b - 1 - c_total,
        jnp.where(c_total >= 3 * b, (wc - 1) - (c_total - 3 * b),
                  c_total - b))

    dc = f * jnp.tan((cyl_col.astype(dtype) + geom.min_x - cx) / f)
    src_c = jnp.round(dc + cx).astype(jnp.int32)            # (W_env,)

    r = jnp.arange(h, dtype=dtype)
    dr = (r[:, None] - cy) * jnp.sqrt(dc[None, :] ** 2 + f * f) / f
    src_r = jnp.round(dr + cy).astype(jnp.int32)            # (H, W_env)

    covered = (src_r >= 0) & (src_r <= h - 1) & \
              (src_c >= 0)[None, :] & (src_c <= w - 1)[None, :]
    src_r = jnp.clip(src_r, 0, h - 1)
    src_c = jnp.clip(src_c, 0, w - 1)
    return src_r, jnp.broadcast_to(src_c[None, :], src_r.shape), covered


# Maps up to this many pixels use the one-hot matmul formulation (MXU)
# instead of a gather (TPU gathers are slow and compile poorly). The
# photometry map (downsampled) is always below this; the full-res
# --save_envmap output uses the gather.
MATMUL_MAX_PIXELS = 262_144


def generate_envmap(background: jnp.ndarray,
                    geom: EnvmapGeometry) -> jnp.ndarray:
    """Image (H, W, 3) in [0,1] -> envmap (H, W_env, 3).

    Matches the reference pipeline output to visual tolerance (gather
    instead of scatter; no interior sparsity holes, no uint8 rounding).
    """
    if geom.height * geom.env_width <= MATMUL_MAX_PIXELS:
        env, covered = _generate_matmul(background, geom)
    else:
        src_r, src_c, covered = _source_indices(geom, background.dtype)
        env = background[src_r, src_c]             # (H, W_env, 3) gather

    kernel = cv2_gaussian_kernel(FEATHER_KSIZE, FEATHER_SIGMA)
    blurred = separable_blur(env, kernel)
    return jnp.where(covered[..., None], env, blurred)


def _generate_matmul(background: jnp.ndarray, geom: EnvmapGeometry):
    """Gather-free envmap: the inverse cylindrical map factorizes into a
    column permutation (bg @ one-hot) followed by a per-column row
    resample (batched one-hot matmul) — both MXU work.
    """
    src_r, src_c, covered = _source_indices(geom, background.dtype)
    h, w = geom.height, geom.width
    we = geom.env_width

    # Column permutation: src_c is constant along rows.
    cols = src_c[0]                                      # (W_env,)
    col_onehot = (cols[None, :] ==
                  jnp.arange(w)[:, None]).astype(background.dtype)
    env1 = jnp.einsum("hwk,wc->hck", background, col_onehot,
                      preferred_element_type=jnp.float32)  # (H, W_env, 3)

    # Per-column row resample: out[r, c] = env1[src_r[r, c], c].
    row_onehot = (src_r.T[:, :, None] ==
                  jnp.arange(h)[None, None, :]).astype(background.dtype)
    env = jnp.einsum("cor,rck->ock", row_onehot, env1,
                     preferred_element_type=jnp.float32)   # (H, W_env, 3)
    return env, covered
