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

import jax
import jax.numpy as jnp

from raintpu.ops.blur import (cv2_gaussian_kernel, separable_blur,
                              separable_blur_hw)

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


# Maps up to this many pixels use the dense one-hot matmul formulation
# (one row_onehot tensor); larger maps use the chunked-central matmul
# (same exact values, bounded working set). TPU gathers are never on
# this path — a full-res 512x1573 batch-12 gather measured 36 ms
# (3 GB/s effective); the chunked matmul is ~20x faster (round 3).
MATMUL_MAX_PIXELS = 262_144


def generate_envmap(background: jnp.ndarray,
                    geom: EnvmapGeometry) -> jnp.ndarray:
    """Image (H, W, 3) in [0,1] -> envmap (H, W_env, 3).

    Matches the reference pipeline output to visual tolerance (gather
    inversion instead of scatter; no interior sparsity holes, no uint8
    rounding).
    """
    if geom.height * geom.env_width <= MATMUL_MAX_PIXELS:
        env, covered = _generate_matmul(background, geom)
    else:
        env, covered = _generate_matmul_chunked(background, geom)

    kernel = cv2_gaussian_kernel(FEATHER_KSIZE, FEATHER_SIGMA)
    blurred = separable_blur(env, kernel)
    return jnp.where(covered[..., None], env, blurred)


def generate_envmap_batch(backgrounds: jnp.ndarray,
                          geom: EnvmapGeometry) -> jnp.ndarray:
    """Batched envmap: (B, H, W, 3) -> (B, H, W_env, 3).

    Value-identical to vmapping :func:`generate_envmap` (same one-hot
    contractions), reshaped so frames and channels fold into a full
    matrix dimension instead of the per-frame einsums' 3-wide lane
    axis. MEASURED SLOWER on v5e despite the lane-occupancy argument
    (9.9 vs 3.8 ms at batch 48 — XLA's layout choices for the vmapped
    batched matmuls beat this hand reshaping), so production keeps the
    vmapped per-frame path; kept tested for a future revisit.
    """
    if geom.height * geom.env_width > MATMUL_MAX_PIXELS:
        # Big maps (full-res save path) keep the chunked per-frame
        # formulation — bounded working set matters more than lanes.
        return jax.vmap(lambda b: generate_envmap(b, geom))(backgrounds)

    src_r, src_c, covered = _source_indices(geom, backgrounds.dtype)
    h, w = geom.height, geom.width
    bsz = backgrounds.shape[0]
    xb = jnp.moveaxis(backgrounds, -1, 1).reshape(bsz * 3, h, w)

    # Column permutation: contract W with full-lane output (n h) x c.
    cols = src_c[0]                                      # (W_env,)
    col_onehot = (cols[None, :] ==
                  jnp.arange(w)[:, None]).astype(backgrounds.dtype)
    env1 = jnp.einsum("nhw,wc->nhc", xb, col_onehot,
                      preferred_element_type=jnp.float32)

    # Per-column row resample: batch c, contract r, N = frames*chan.
    row_onehot = (src_r.T[:, :, None] ==
                  jnp.arange(h)[None, None, :]).astype(backgrounds.dtype)
    env = jnp.einsum("cor,nrc->noc", row_onehot, env1,
                     preferred_element_type=jnp.float32)  # (N, H, W_env)

    kernel = cv2_gaussian_kernel(FEATHER_KSIZE, FEATHER_SIGMA)
    blurred = separable_blur_hw(env, kernel)
    env = jnp.where(covered[None], env, blurred)
    return jnp.moveaxis(env.reshape(bsz, 3, h, geom.env_width), 1, -1)


def _central_source_indices(geom: EnvmapGeometry, dtype=jnp.float32):
    """Source coords + coverage for the CENTRAL cylinder only
    (cyl_width columns, no mirror flanks). Same math as
    :func:`_source_indices` without the column-mirror arithmetic."""
    h, w = geom.height, geom.width
    cx, cy = w // 2, h // 2
    f = float(geom.focal_env)

    cyl_col = jnp.arange(geom.cyl_width)
    dc = f * jnp.tan((cyl_col.astype(dtype) + geom.min_x - cx) / f)
    src_c = jnp.round(dc + cx).astype(jnp.int32)            # (Wc,)

    r = jnp.arange(h, dtype=dtype)
    dr = (r[:, None] - cy) * jnp.sqrt(dc[None, :] ** 2 + f * f) / f
    src_r = jnp.round(dr + cy).astype(jnp.int32)            # (H, Wc)

    covered = (src_r >= 0) & (src_r <= h - 1) & \
              (src_c >= 0)[None, :] & (src_c <= w - 1)[None, :]
    return (jnp.clip(src_r, 0, h - 1), jnp.clip(src_c, 0, w - 1),
            covered)


# Column-chunk width of the chunked row-resample (lane-width multiple;
# bounds the transient one-hot at CHUNK x H x H floats).
_CHUNK_COLS = 128


def _generate_matmul_chunked(background: jnp.ndarray,
                             geom: EnvmapGeometry):
    """Gather-free envmap at any size: compute the CENTRAL cylinder by
    (column-permute matmul) x (chunked per-column row-resample matmul),
    then build the mirror flanks as flips — they are exact column
    reflections of the central part (bad_weather.py:800-813), so no
    extra compute. The per-chunk one-hot keeps the working set at
    CHUNK x H x H instead of W_env x H x H (1.6 GB at Cityscapes full
    res, which is why the dense path is capped).

    Each output pixel's one-hot row has exactly one nonzero, so the
    matmul reproduces the gather BIT-EXACTLY.
    """
    h, w = geom.height, geom.width
    wc = geom.cyl_width
    b = geom.border
    src_r, src_c, covered_c = _central_source_indices(
        geom, background.dtype)

    # Stage 1: column permutation (src_c constant along rows).
    col_onehot = (src_c[None, :] ==
                  jnp.arange(w)[:, None]).astype(background.dtype)
    env1 = jnp.einsum("hwk,wc->hck", background, col_onehot,
                      preferred_element_type=jnp.float32)    # (H, Wc, 3)

    # Stage 2: per-column row resample, in column chunks.
    pad = (-wc) % _CHUNK_COLS
    src_r_p = jnp.pad(src_r, ((0, 0), (0, pad)))
    env1_p = jnp.pad(env1, ((0, 0), (0, pad), (0, 0)))
    rows = jnp.arange(h)
    chunks = []
    for c0 in range(0, wc + pad, _CHUNK_COLS):
        oh = (src_r_p[:, c0:c0 + _CHUNK_COLS, None] ==
              rows[None, None, :]).astype(background.dtype)
        chunks.append(jnp.einsum(
            "ocr,rck->ock", oh, env1_p[:, c0:c0 + _CHUNK_COLS],
            preferred_element_type=jnp.float32))
    central = jnp.concatenate(chunks, axis=1)[:, :wc]        # (H, Wc, 3)

    # Mirror flanks (verified against _source_indices' column map):
    #   c_total <  b      -> cyl col b-1-c_total   = flip(central[:, :b])
    #   b <= c_total < 3b -> cyl col c_total - b   = central[:, :2b]
    #   c_total >= 3b     -> cyl col wc-1-(ct-3b)  = flip(central[:, b:])
    env = jnp.concatenate([central[:, b - 1::-1], central[:, :2 * b],
                           central[:, :b - 1:-1]], axis=1)
    covered = jnp.concatenate(
        [covered_c[:, b - 1::-1], covered_c[:, :2 * b],
         covered_c[:, :b - 1:-1]], axis=1)
    return env, covered


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
