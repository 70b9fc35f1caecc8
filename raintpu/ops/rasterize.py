"""Batched streak rasterization: inverse-warp drops into fixed-size patches.

The reference renders each drop on host with cv2: Big drops get a
perspective warp of the texture onto the streak trapezoid
(``bad_weather.py:300-329`` + ``generator.py:127-132``), Small/Medium
drops get imutils.rotate_bound + optional vertical flip + cv2.resize
(``generator.py:136-171``). Both are *forward* image warps.

TPU-native redesign: every drop is rasterized by an *inverse* map — a
single per-drop 3x3 matrix taking patch coordinates to texture
coordinates (a solved homography for Big drops; the closed-form
composition rotate∘flip∘resize for Small/Medium) — evaluated on a fixed
(PH, PW) patch grid with supersampled bilinear texture fetches
(approximating cv2's INTER_AREA/INTER_CUBIC). Fixed patch shapes make
the whole frame's drops one vmapped tensor op; drops are routed into a
small set of size buckets so big defocused streaks don't inflate the
patch size for everyone.

Patch-space convention: patch pixel (row i, col j) of a drop with anchor
A (image pixel of patch origin) shows image pixel A + (j, i). The drop's
content (the reference's warped patch) is anchored at minC - shift
(defocus margin, ``bad_weather.py:416-422``), clipped at the image
border exactly like the reference's delta-crop.
"""

from __future__ import annotations

import dataclasses
import math

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raintpu.ops.blur import variable_separable_blur
from raintpu.particles.schema import TYPE_BIG, DropBatch

WARP_EPS = 0.001  # reference epsilon against singular homographies (:315)

# Alpha below this renders as exact 0 (< 0.06 of a uint8 level). The
# reference's footprint is bounded by its truncated (4-sigma) blur
# kernels; the analytic erf window has infinite tails, so without a
# cutoff the rain-mask support is float dust and mask IoU vs the
# reference is meaningless.
ALPHA_CUTOFF = 2e-4


def tanh_erf(x):
    """tanh-based erf approximation (max abs err ~3e-3).

    Used for the blurred-box content window in both the XLA and Pallas
    fourier rasterizers — Pallas TPU has no erf lowering, and using the
    same approximation everywhere keeps the paths bit-consistent. The
    window is a modeling choice, so ~1e-3 accuracy is immaterial.
    """
    x3 = x * x * x
    return jnp.tanh(1.1283791671 * x + 0.1009055155 * x3)


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """One patch-size class. radius = max blur kernel radius (and margin).

    modes_y/modes_x truncate the DCT series for this bucket (0 = all):
    buckets whose drops are heavily downscaled or defocused have their
    high modes damped to ~0 anyway, so evaluating them is wasted VPU
    work (cost scales linearly with mode count). ``ranks`` truncates
    the SVD rank axis the same way (0 = all): the texture bank's
    ranks are energy-ordered and ranks 5-6 add < 0.001 relative rmse
    even unblurred (measured round 3), while eval cost scales with
    ranks * (modes_y + modes_x)."""

    ph: int
    pw: int
    radius: int
    capacity: int
    modes_y: int = 0
    modes_x: int = 0
    ranks: int = 0


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    buckets: Tuple[BucketSpec, ...]
    supersample: int = 2
    # The reference hardcodes the CoC pixel size to 4.65e-6 m
    # (bad_weather.py:469) regardless of dataset; kept for parity.
    coc_pixsize: float = 4.65e-6
    # Texture sampling: "fourier" evaluates the separable DCT streak
    # representation analytically (no gathers, defocus + antialiasing
    # folded in as per-mode damping — the TPU-native path); "gather"
    # bilinearly samples the stored textures (golden/compat path; its
    # big gathers are pathological for the TPU compiler).
    texture_mode: str = "fourier"
    # Modal blur (round 4): heavily-defocused drops re-represent each
    # blurred axis profile in the cosine basis of a per-drop interval
    # padded past the blur reach, where spectral damping IS the exact
    # compact blur (see fourier_drop_coefficients). Fixes the classic
    # model's support widening at sigma_hat >~ 0.05 (measured 1.3x
    # support at equal mass on close-scene drops). Off switch for A/B.
    modal_blur: bool = True

    @staticmethod
    def default(capacity: int) -> "RasterConfig":
        # Smallest bucket first: the typical drop is a few px wide and
        # tens of px long, and composite cost scales with window area.
        # Capacities taper with bucket size (the population is heavily
        # skewed toward 1-2 px drops) — every padded slot costs a gated
        # kernel grid step (~0.06 us marginal, round-3 kprof), so
        # oversized buckets waste a little; undersized ones truncate.
        # Overflow counters surface any workload that needs a bigger
        # bucket.
        return RasterConfig(buckets=(
            BucketSpec(40, 32, 5, capacity, 16, 8),
            BucketSpec(96, 64, 12, max(64, capacity // 2), 24, 10),
            BucketSpec(320, 192, 32, max(32, capacity // 8), 16, 8),
            BucketSpec(704, 384, 48, max(16, capacity // 32), 12, 6),
        ))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RasterBucket:
    """Rasterized (and blurred) drops of one size bucket."""

    patches: jnp.ndarray   # (C, PH, PW) float32 — blurred gray in [0, 1]
    anchor: jnp.ndarray    # (C, 2) int32 — image (x, y) of patch origin
    drop_idx: jnp.ndarray  # (C,) int32 — index into the frame's DropBatch
    valid: jnp.ndarray     # (C,) bool
    overflow: jnp.ndarray  # scalar int32 — drops that did not fit capacity


def per_drop_keys(key: jax.Array, n: int, offset) -> jax.Array:
    """Fold a global per-drop index into the frame key.

    Keying randomness by *global* drop index (offset = shard start when
    drops are sharded over a mesh 'sp' axis) makes texture/noise draws
    invariant to how drops are partitioned across devices.
    """
    idx = offset + jnp.arange(n, dtype=jnp.int32)
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)


def select_textures(drops: DropBatch, bin_edges: jnp.ndarray,
                    key: jax.Array, offset=0) -> jnp.ndarray:
    """Ratio-binned random texture pick (reference take_drop_texture).

    bin = number of edges <= ratio; texture = 10*bin + uniform[0, 10).
    """
    n = drops.ratio.shape[0]
    bins = jnp.sum(drops.ratio[:, None] >= bin_edges[None, :],
                   axis=-1).astype(jnp.int32)
    keys = per_drop_keys(key, n, offset)
    offs = jax.vmap(
        lambda k: jax.random.randint(k, (), 0, 10, dtype=jnp.int32))(keys)
    return bins * 10 + offs


def circle_of_confusion(dist: jnp.ndarray, *, focal_m: float,
                        f_number: float, focus_plane: float,
                        pixsize: float) -> jnp.ndarray:
    """|CoC| in pixels for object distance (m). Reference
    ``RainRenderer.compute_circle`` (bad_weather.py:464-469)."""
    o = jnp.maximum(jnp.abs(dist), 1e-3)
    c = ((o - focus_plane) * focal_m ** 2) / (
        o * (focus_plane - focal_m) * f_number)
    return jnp.abs(c / pixsize)


def _big_geometry(drops: DropBatch, tex_hw, image_wh):
    """Bbox + inverse homography for Big drops (all N; masked later).

    Returns (minx, miny, w_c, h_c, M) with M the patch->texture 3x3.
    """
    th, tw = tex_hw
    w_img, h_img = image_wh
    x0, y0 = drops.ip1[:, 0], drops.ip1[:, 1]
    x1, y1 = drops.ip2[:, 0], drops.ip2[:, 1]
    d0 = jnp.floor(drops.iw1)
    d1 = jnp.floor(drops.iw2)

    minx = jnp.maximum(jnp.minimum(x0, x1), 0.0)
    miny = jnp.maximum(jnp.minimum(y0, y1), 0.0)
    maxx = jnp.minimum(jnp.maximum(x0 + d0, x1 + d1), float(w_img))
    maxy = jnp.minimum(jnp.maximum(y0, y1), float(h_img))
    w_c = jnp.maximum(maxx - minx, 1.0)
    h_c = jnp.maximum(maxy - miny, 1.0)

    # Destination quad (reference warping_points :317-327): a trapezoid
    # with HORIZONTAL top and bottom edges — top (y=ya) spans
    # [xa, xa+d0], bottom (y=yb) spans [xb, xb+d1]. The 4-point
    # homography therefore has the closed form
    #   H = [[d0/tw, h12, xa], [0, h22, ya], [0, h32, 1]]
    # (solving a batched 8x8 DLT per drop, as cv2 does, costs thousands
    # of tiny LU factorizations — scalar poison on TPU).
    xa = x0 - minx
    ya = y0 - miny
    xb = x1 - minx + WARP_EPS
    yb = y1 - miny
    d1c = jnp.maximum(d1, WARP_EPS)     # degenerate bottom edge guard

    wths = d0 / d1c                     # projective weight at y_t = th
    h11 = d0 / tw
    h13 = xa
    h23 = ya
    h32 = (wths - 1.0) / th
    h12 = (xb * wths - xa) / th
    h22 = (yb * wths - ya) / th

    # Inverse (patch -> texture) via the adjugate of
    # [[a, b, c], [0, e, f], [0, g, 1]] (scale cancels in hx/hz).
    a, b_, c_ = h11, h12, h13
    e, f_, g_ = h22, h23, h32
    zeros = jnp.zeros_like(a)
    M = jnp.stack([
        jnp.stack([e - f_ * g_, -(b_ - c_ * g_), b_ * f_ - c_ * e], -1),
        jnp.stack([zeros, a + jnp.zeros_like(e), -a * f_], -1),
        jnp.stack([zeros, -a * g_, a * e], -1),
    ], axis=1).astype(jnp.float32)      # (N, 3, 3)
    M = jnp.where(jnp.all(jnp.isfinite(M), axis=(1, 2))[:, None, None],
                  M, 0.0)
    return minx, miny, w_c, h_c, M


def _sm_geometry(drops: DropBatch, tex_hw, image_wh,
                 noise_deg: jnp.ndarray):
    """Closed-form inverse affine for Small/Medium drops (all N).

    Mirrors generator.py:136-171: rotation angle from the streak
    direction (plus wind noise), imutils.rotate_bound canvas, optional
    vertical flip when the streak sits in the right half of the image,
    then resize to (w_c, h_c). Returns (minx, miny, w_c, h_c, M).
    """
    th, tw = tex_hw
    w_img, _ = image_wh

    d = drops.ip1 - drops.ip2
    n1 = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
    dirx, diry = d[:, 0] / n1, d[:, 1] / n1
    theta = jnp.arccos(jnp.clip(-diry, -1.0, 1.0))      # radians, [0, pi]

    # Wind noise: rotate endpoint coords by `noise` about the midpoint
    # (then truncate to int — the reference assigns floats into an int
    # array), and rotate the texture by theta + noise.
    nz = jnp.deg2rad(noise_deg)
    nx, ny = jnp.cos(nz), jnp.sin(nz)
    mean = (drops.ip1 + drops.ip2) / 2.0

    def jitter(p):
        rx = (p[:, 0] - mean[:, 0]) * nx - (p[:, 1] - mean[:, 1]) * ny + mean[:, 0]
        ry = (p[:, 0] - mean[:, 0]) * ny + (p[:, 1] - mean[:, 1]) * nx + mean[:, 1]
        return jnp.stack([rx, ry], -1).astype(jnp.int32).astype(jnp.float32)

    p1 = jitter(drops.ip1)
    p2 = jitter(drops.ip2)

    alpha = theta + nz                                   # total rotation
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    nW = jnp.floor(th * jnp.abs(sa) + tw * jnp.abs(ca))
    nH = jnp.floor(th * jnp.abs(ca) + tw * jnp.abs(sa))
    nW = jnp.maximum(nW, 1.0)
    nH = jnp.maximum(nH, 1.0)

    flip = p2[:, 0] > (w_img // 2)
    h_c = jnp.maximum(jnp.abs(p2[:, 1] - p1[:, 1]), 2.0)
    w_c = jnp.maximum(jnp.abs(p2[:, 0] - p1[:, 0]),
                      drops.max_width.astype(jnp.float32) + 2.0)
    minx, miny = p1[:, 0], p1[:, 1]

    # patch (x, y) -> canvas: c = s * p + (0.5*s - 0.5); optional y-flip
    # about (nH-1); canvas -> texture: t = L^T (c - canvas_ctr) + tex_ctr.
    sx = nW / w_c
    sy = nH / h_c
    fsy = jnp.where(flip, -sy, sy)
    foy = jnp.where(flip, (nH - 1.0) - (0.5 * sy - 0.5), 0.5 * sy - 0.5)
    ox = 0.5 * sx - 0.5

    cx_t, cy_t = tw // 2, th // 2
    # t_x = ca*(c_x - nW/2) + sa*(c_y - nH/2) + cx_t
    # t_y = -sa*(c_x - nW/2) + ca*(c_y - nH/2) + cy_t
    a00 = ca * sx
    a01 = sa * fsy
    a02 = ca * (ox - nW / 2.0) + sa * (foy - nH / 2.0) + cx_t
    a10 = -sa * sx
    a11 = ca * fsy
    a12 = -sa * (ox - nW / 2.0) + ca * (foy - nH / 2.0) + cy_t
    zeros = jnp.zeros_like(a00)
    ones = jnp.ones_like(a00)
    M = jnp.stack([
        jnp.stack([a00, a01, a02], -1),
        jnp.stack([a10, a11, a12], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], axis=1)                                           # (N, 3, 3)
    return minx, miny, w_c, h_c, M


@dataclasses.dataclass
class DropGeometry:
    """Per-drop raster parameters for a frame (length-N arrays)."""

    M: jnp.ndarray        # (N, 3, 3) patch-content -> texture
    min_c: jnp.ndarray    # (N, 2) float — content anchor (x, y), pre-shift
    content_wh: jnp.ndarray  # (N, 2) float — (w_c, h_c)
    sigma: jnp.ndarray    # (N,) float — defocus CoC (0 when disabled)
    shift: jnp.ndarray    # (N,) int32 — reference margin int(10*sigma)
    band: jnp.ndarray     # (N, 4) float — (UL, UU, VL, VU) content band
    #                       in normalized texture coords (see _tex_band)


def _tex_band(M: jnp.ndarray, wh_c: jnp.ndarray, is_big: jnp.ndarray,
              tex_hw) -> jnp.ndarray:
    """Texture-coordinate content band (UL, UU, VL, VU) per drop.

    The reference's Big-drop branch warps onto a canvas of exactly
    (maxx-minx, maxy-miny) — the destination-quad bbox CLIPPED TO THE
    IMAGE (``warping_points``, bad_weather.py:303-313) — and the canvas
    crop happens BEFORE the defocus blur (generator.py:127-132 then
    circle_of_confusion). A drop whose quad leaves the frame therefore
    loses that content entirely; only the blur of what SURVIVED spills
    back in. Measured on the close parity scene: a bottom-clipped big
    drop rendered 1.55x the reference's mass until this clip was
    modeled (round 4).

    We fold the clip into the texture-rect window: instead of the fixed
    band [0,1]^2, the erf window runs over [UL,UU]x[VL,VU] where the
    bounds are the canvas box mapped into texture coords. Under the
    closed-form Big homography v depends ONLY on ly (hz has no lx
    term), so the y-cut is exact; the x-cut is evaluated at the content
    midheight (the quad's side edges are near-vertical at the scales
    the branch produces). Unclipped drops and all Small/Medium drops
    (whose canvas is never pre-blur-cropped — rotate+resize builds the
    full canvas, generator.py:136-171) keep the exact [0,1] band, so
    this is bit-identical for them.
    """
    th, tw = tex_hw
    w_c, h_c = wh_c[:, 0], wh_c[:, 1]

    def apply(x, y):
        hx = M[:, 0, 0] * x + M[:, 0, 1] * y + M[:, 0, 2]
        hy = M[:, 1, 0] * x + M[:, 1, 1] * y + M[:, 1, 2]
        hz = M[:, 2, 0] * x + M[:, 2, 1] * y + M[:, 2, 2]
        hz = jnp.where(jnp.abs(hz) < 1e-9, 1e-9, hz)
        return hx / hz, hy / hz

    cx = (w_c - 1.0) / 2.0
    cy = (h_c - 1.0) / 2.0
    # Canvas edge pixels' outer faces, in normalized texture coords.
    tx0, _ = apply(-0.5, cy)
    tx1, _ = apply(w_c - 0.5, cy)
    _, ty0 = apply(cx, -0.5)
    _, ty1 = apply(cx, h_c - 0.5)
    u0 = (tx0 + 0.5) / tw
    u1 = (tx1 + 0.5) / tw
    v0 = (ty0 + 0.5) / th
    v1 = (ty1 + 0.5) / th

    ul = jnp.clip(jnp.minimum(u0, u1), 0.0, 1.0)
    uu = jnp.clip(jnp.maximum(u0, u1), 0.0, 1.0)
    vl = jnp.clip(jnp.minimum(v0, v1), 0.0, 1.0)
    vu = jnp.clip(jnp.maximum(v0, v1), 0.0, 1.0)

    zero = jnp.zeros_like(ul)
    one = jnp.ones_like(ul)
    return jnp.stack([jnp.where(is_big, ul, zero),
                      jnp.where(is_big, uu, one),
                      jnp.where(is_big, vl, zero),
                      jnp.where(is_big, vu, one)], -1)


def drop_geometry(drops: DropBatch,
                  tex_hw: Tuple[int, int],
                  image_wh: Tuple[int, int],
                  *,
                  focal_m: float,
                  f_number: float,
                  focus_plane: float,
                  coc_pixsize: float,
                  apply_defocus: bool,
                  noise_deg: Optional[jnp.ndarray] = None) -> DropGeometry:
    """Compute every drop's inverse-warp matrix, anchor and defocus."""
    n = drops.ip1.shape[0]
    if noise_deg is None:
        noise_deg = jnp.zeros((n,), jnp.float32)

    bx, by, bw, bh, bM = _big_geometry(drops, tex_hw, image_wh)
    sx_, sy_, sw, sh, sM = _sm_geometry(drops, tex_hw, image_wh, noise_deg)

    is_big = drops.drop_type == TYPE_BIG
    minx = jnp.where(is_big, bx, sx_)
    miny = jnp.where(is_big, by, sy_)
    w_c = jnp.where(is_big, bw, sw)
    h_c = jnp.where(is_big, bh, sh)
    M = jnp.where(is_big[:, None, None], bM, sM)

    if apply_defocus:
        sigma = circle_of_confusion(
            drops.wp1[:, 2], focal_m=focal_m, f_number=f_number,
            focus_plane=focus_plane, pixsize=coc_pixsize)
        shift = jnp.floor(10.0 * sigma).astype(jnp.int32)
    else:
        sigma = jnp.zeros((n,), jnp.float32)
        shift = jnp.zeros((n,), jnp.int32)

    wh_c = jnp.stack([w_c, h_c], -1)
    return DropGeometry(
        M=M, min_c=jnp.stack([minx, miny], -1),
        content_wh=wh_c, sigma=sigma, shift=shift,
        band=_tex_band(M, wh_c, is_big, tex_hw))


def _sample_texture(textures: jnp.ndarray, tex_idx: jnp.ndarray,
                    tx: jnp.ndarray, ty: jnp.ndarray) -> jnp.ndarray:
    """Bilinear fetch with zero border. textures (K, TH, TW);
    tex_idx (C,); tx/ty (C, ...) -> (C, ...)."""
    _, th, tw = textures.shape
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < tw) & (yi >= 0) & (yi < th)
        xi = jnp.clip(xi, 0, tw - 1)
        yi = jnp.clip(yi, 0, th - 1)
        idx = tex_idx.reshape((-1,) + (1,) * (tx.ndim - 1))
        vals = textures[idx, yi, xi]
        return jnp.where(inb, vals, 0.0)

    return ((1 - fx) * (1 - fy) * tap(x0i, y0i)
            + fx * (1 - fy) * tap(x0i + 1, y0i)
            + (1 - fx) * fy * tap(x0i, y0i + 1)
            + fx * fy * tap(x0i + 1, y0i + 1))


def _eval_dct_rank_series(coefs: jnp.ndarray, xhat: jnp.ndarray):
    """Evaluate R cosine series at arbitrary points via the Chebyshev
    recurrence (cos(m*theta) from cos(theta)) — one transcendental per
    point, then M*R fused multiply-adds. coefs: (C, R, M);
    xhat: (C, PH, PW) in [0, 1] (even-periodic outside).
    Returns (R, C, PH, PW) stacked rank values.
    """
    c_, r_, m_ = coefs.shape
    t = jnp.cos(jnp.pi * xhat)
    accs = [jnp.broadcast_to(coefs[:, r, 0][:, None, None], xhat.shape)
            for r in range(r_)]
    cm_prev = jnp.ones_like(t)
    cm = t
    for m in range(1, m_):
        for r in range(r_):
            accs[r] = accs[r] + coefs[:, r, m][:, None, None] * cm
        cm, cm_prev = 2.0 * t * cm - cm_prev, cm
    return accs


def _mode_damping(sigma_hat: jnp.ndarray, n_modes: int) -> jnp.ndarray:
    """Gaussian blur as spectral damping: mode m scales by
    exp(-(pi*m*sigma_hat)^2 / 2). sigma_hat: (C,) normalized sigma."""
    m = jnp.arange(n_modes, dtype=jnp.float32)
    return jnp.exp(-0.5 * (jnp.pi * m[None, :] * sigma_hat[:, None]) ** 2)


def _tex_jacobian(m_sel: jnp.ndarray, wh_c: jnp.ndarray) -> jnp.ndarray:
    """Jacobian d(tex)/d(patch) of the (possibly projective) inverse map
    at the content center. m_sel: (C, 3, 3); wh_c: (C, 2). -> (C, 2, 2)
    with rows (dtx/dlx, dtx/dly), (dty/dlx, dty/dly)."""
    cx = wh_c[:, 0] / 2.0
    cy = wh_c[:, 1] / 2.0

    def apply(mm, x, y):
        hx = mm[:, 0, 0] * x + mm[:, 0, 1] * y + mm[:, 0, 2]
        hy = mm[:, 1, 0] * x + mm[:, 1, 1] * y + mm[:, 1, 2]
        hz = mm[:, 2, 0] * x + mm[:, 2, 1] * y + mm[:, 2, 2]
        hz = jnp.where(jnp.abs(hz) < 1e-9, 1e-9, hz)
        return hx / hz, hy / hz

    tx0, ty0 = apply(m_sel, cx, cy)
    txx, tyx = apply(m_sel, cx + 1.0, cy)
    txy, tyy = apply(m_sel, cx, cy + 1.0)
    return jnp.stack([
        jnp.stack([txx - tx0, txy - tx0], -1),
        jnp.stack([tyx - ty0, tyy - ty0], -1),
    ], axis=1)


def _compact(mask: jnp.ndarray, capacity: int):
    """First `capacity` true indices of mask (sorted), + validity."""
    n = mask.shape[0]
    idx = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), n)
    idx = jnp.sort(idx)
    if capacity > n:
        idx = jnp.pad(idx, (0, capacity - n), constant_values=n)
    idx = idx[:capacity]
    sel_valid = idx < n
    overflow = jnp.sum(mask.astype(jnp.int32)) - jnp.sum(
        sel_valid.astype(jnp.int32))
    return jnp.minimum(idx, n - 1), sel_valid, overflow


def _patch_tex_coords(ph, pw, m_sel, offx, offy, sub_y=0.0, sub_x=0.0):
    """Content-local coords + texture coords for every patch pixel.

    Returns (lx, ly, tx, ty), each broadcastable to (C, PH, PW)."""
    ii = jnp.arange(ph, dtype=jnp.float32) + sub_y
    jj = jnp.arange(pw, dtype=jnp.float32) + sub_x
    ly = ii[None, :, None] - offy[:, None, None]        # (C, PH, 1)
    lx = jj[None, None, :] - offx[:, None, None]        # (C, 1, PW)
    hx = (m_sel[:, 0, 0, None, None] * lx
          + m_sel[:, 0, 1, None, None] * ly + m_sel[:, 0, 2, None, None])
    hy = (m_sel[:, 1, 0, None, None] * lx
          + m_sel[:, 1, 1, None, None] * ly + m_sel[:, 1, 2, None, None])
    hz = (m_sel[:, 2, 0, None, None] * lx
          + m_sel[:, 2, 1, None, None] * ly + m_sel[:, 2, 2, None, None])
    hz = jnp.where(jnp.abs(hz) < 1e-9, 1e-9, hz)
    return lx, ly, hx / hz, hy / hz


def _raster_bucket_gather(b: BucketSpec, supersample, textures, t_sel,
                          m_sel, wh_c, offx, offy) -> jnp.ndarray:
    """Bilinear-gather rasterization with subsample accumulation
    (accumulating at (PH, PW) instead of materializing (PH*s, PW*s),
    which is s^2 the memory)."""
    s = supersample
    g = jnp.zeros((b.capacity, b.ph, b.pw), jnp.float32)
    for sy in range(s):
        for sx in range(s):
            dy = (sy + 0.5) / s - 0.5
            dx = (sx + 0.5) / s - 0.5
            lx, ly, tx, ty = _patch_tex_coords(b.ph, b.pw, m_sel,
                                               offx, offy, dy, dx)
            inside = ((lx > -0.5) & (lx < wh_c[:, 0, None, None] - 0.5)
                      & (ly > -0.5) & (ly < wh_c[:, 1, None, None] - 0.5))
            sample = _sample_texture(textures, t_sel, tx, ty)
            g = g + jnp.where(inside, sample, 0.0)
    # Mean over subsamples, clip [0, 1] (reference clips after warp,
    # generator.py:132,170).
    return jnp.clip(g / (s * s), 0.0, 1.0)


# Modal-blur quadrature resolution (samples per padded interval). The
# sampled profile is pre-filtered (classic damping at the sample
# spacing) before sampling, so 64 points are alias-free for any mode
# count / pad length.
MODAL_S = 64
# Below this normalized sigma the classic mirror-damped model is
# already exact to ~1e-3 and modal re-representation buys nothing.
MODAL_FLOOR = 0.04


def _modal_thresh(modes: int) -> float:
    """Smallest normalized sigma at which `modes` cosine modes on the
    padded interval resolve the damped spectrum: the damping cuts the
    spectrum at ~2.5 L / (pi sigma) modes with L = 1.1 + 8.5 sigma.
    Returns inf when the bucket's truncated mode budget can never
    cover it (the classic model stays in charge there)."""
    denom = math.pi * modes - 21.25
    if denom <= 0:
        return float("inf")
    return max(MODAL_FLOOR, 2.75 / denom)


def _modal_axis(c, bl, bu, sig):
    """Exact-blur re-representation of one axis profile (see
    fourier_drop_coefficients). c: (C, R, M) cosine coefficients on
    [0, 1]; bl/bu: (C,) content band (canvas clip); sig: (C,)
    normalized blur std. Returns (c2, a, L): coefficients of the
    blurred band-windowed profile in the cosine basis of [a, a+L].

    The padded interval reaches 4.25 sigma past the band, where the
    even-periodic extension's mirror copies are < e^-9 — so per-mode
    Gaussian damping on THIS interval is the compact (zero-padded)
    blur, exactly. An anti-alias prefilter (classic mirror damping at
    the quadrature spacing) bandlimits the profile before sampling;
    the remaining blur is applied spectrally after re-analysis.
    """
    n, r_, m_ = c.shape
    s_pts = MODAL_S
    pad = 4.25 * sig + 0.05
    a = bl - pad
    length = (bu - bl) + 2.0 * pad

    # Anti-alias split: sig^2 = sig_pre^2 + sig_post^2.
    h = length / s_pts                                   # (C,) spacing
    sig_pre = jnp.minimum(sig, 1.2 * h)
    sig_post = jnp.sqrt(jnp.maximum(sig ** 2 - sig_pre ** 2, 0.0))
    c_pre = c * _mode_damping(sig_pre, m_)[:, None, :]

    # Per-drop synthesis at quadrature points (C, R, S) — via the
    # shared Chebyshev recurrence (one cos per point, M FMAs) instead
    # of materializing a (C, S, M) cos basis.
    t = (jnp.arange(s_pts, dtype=jnp.float32) + 0.5) / s_pts
    q = a[:, None] + t[None, :] * length[:, None]
    f = jnp.stack(_eval_dct_rank_series(c_pre, q[:, None, :]),
                  axis=1)[:, :, 0, :]

    # Band window at fractional-coverage (box) resolution.
    cov = (jnp.minimum(bu[:, None], q + 0.5 * h[:, None])
           - jnp.maximum(bl[:, None], q - 0.5 * h[:, None]))
    cov = jnp.clip(cov / jnp.maximum(h[:, None], 1e-9), 0.0, 1.0)
    f = f * cov[:, None, :]

    # Static DCT-II analysis back to M modes, then padded-interval
    # damping with the remaining blur.
    kk = jnp.arange(m_, dtype=jnp.float32)
    ana = jnp.cos(jnp.pi * kk[:, None] * t[None, :])     # (M, S)
    scale = jnp.where(kk == 0, 1.0 / s_pts, 2.0 / s_pts)
    d = jnp.einsum("crs,ms->crm", f, ana) * scale[None, None, :]
    damp = jnp.exp(-0.5 * (jnp.pi * kk[None, :]
                           * (sig_post / length)[:, None]) ** 2)
    return d * damp[:, None, :], a, length


def fourier_drop_coefficients(b: BucketSpec, fourier, t_sel, m_sel,
                              wh_c, sigma, tex_hw, apply_defocus: bool,
                              band=None, modal: bool = True):
    """Per-drop damped DCT coefficients + window parameters.

    Per-drop texture coefficients come via a one-hot matmul (MXU, no
    gather); defocus blur (sigma rows, sigma/2 cols in patch space —
    bad_weather.py:291) and pixel-footprint antialiasing (INTER_AREA
    equivalent, box variance J^2/12) become per-mode Gaussian damping
    through the warp Jacobian.

    CLASSIC model: damp the mirror-extended series, window by the
    blurred indicator of the content band (erf edges at the projected
    sigma). Exact for sigma_hat << band, but blur of the MIRROR
    extension flattens bump profiles once the blur reach is a sizable
    fraction of the band — measured round 4: 1.3x support at equal
    mass vs the real reference on sigma_hat ~ 0.2 close-scene drops
    (the gather path, which warps + blurs discretely, matched the
    reference exactly; the factorization was the whole gap).

    MODAL model (per axis, where sigma_hat exceeds _modal_thresh and
    the bucket's mode budget can represent the result): re-represent
    the band-windowed profile in the cosine basis of a per-drop
    interval padded past the blur reach (_modal_axis) — damping there
    IS the compact blur — and remap the kernel's texture coordinate
    onto that interval by folding the affine stretch into the
    homography row. The kernel's window then degenerates to a sharp
    band cut (the profile already carries its own decay), so the
    kernel evaluates BOTH models with the same code and cost.

    Returns (ayc, bxc, m_out, ul, uu, vl, vu, sx, sy): coefficients,
    the (possibly remapped) inverse homography, and the per-drop
    window band + edge sigmas in the kernel's texture coordinates.
    """
    ay, bx = fourier
    if b.ranks:
        ay = ay[:, :b.ranks]
        bx = bx[:, :b.ranks]
    if b.modes_y:
        ay = ay[:, :, :b.modes_y]
    if b.modes_x:
        bx = bx[:, :, :b.modes_x]
    k, r_, m_modes = ay.shape
    n_modes = bx.shape[2]
    th, tw = tex_hw

    onehot = (t_sel[:, None] ==
              jnp.arange(k, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    ayc = (onehot @ ay.reshape(k, r_ * m_modes)).reshape(-1, r_, m_modes)
    bxc = (onehot @ bx.reshape(k, r_ * n_modes)).reshape(-1, r_, n_modes)

    jac = _tex_jacobian(m_sel, wh_c)                    # (C, 2, 2)
    s_rows = sigma if apply_defocus else jnp.zeros_like(sigma)
    s_cols = s_rows / 2.0
    var_tx = ((jac[:, 0, 0] * s_cols) ** 2 + (jac[:, 0, 1] * s_rows) ** 2
              + (jac[:, 0, 0] ** 2 + jac[:, 0, 1] ** 2) / 12.0)
    var_ty = ((jac[:, 1, 0] * s_cols) ** 2 + (jac[:, 1, 1] * s_rows) ** 2
              + (jac[:, 1, 0] ** 2 + jac[:, 1, 1] ** 2) / 12.0)
    sig_xhat = jnp.sqrt(var_tx) / tw
    sig_yhat = jnp.sqrt(var_ty) / th

    if band is None:
        ul = vl = jnp.zeros_like(sig_xhat)
        uu = vu = jnp.ones_like(sig_xhat)
    else:
        ul, uu, vl, vu = (band[:, i] for i in range(4))

    ayc_cl = ayc * _mode_damping(sig_yhat, m_modes)[:, None, :]
    bxc_cl = bxc * _mode_damping(sig_xhat, n_modes)[:, None, :]
    m_out = m_sel

    thx = _modal_thresh(n_modes)
    thy = _modal_thresh(m_modes)
    if modal and math.isfinite(thx):
        use = sig_xhat > thx
        bxc_mo, a_x, l_x = _modal_axis(bxc, ul, uu, sig_xhat)
        bxc_cl = jnp.where(use[:, None, None], bxc_mo, bxc_cl)
        # Fold xhat -> (xhat - a)/L into homography row 0:
        # hx' = hx/L + hz * ((0.5 - a*tw)/L - 0.5).
        g0 = jnp.where(use, 1.0 / l_x, 1.0)
        g1 = jnp.where(use, (0.5 - a_x * tw) / l_x - 0.5, 0.0)
        m_out = m_out.at[:, 0, :].set(
            m_out[:, 0, :] * g0[:, None]
            + m_out[:, 2, :] * g1[:, None])
        ul = jnp.where(use, 0.0, ul)
        uu = jnp.where(use, 1.0, uu)
        sig_xhat = jnp.where(use, 2e-3, sig_xhat)
    if modal and math.isfinite(thy):
        use = sig_yhat > thy
        ayc_mo, a_y, l_y = _modal_axis(ayc, vl, vu, sig_yhat)
        ayc_cl = jnp.where(use[:, None, None], ayc_mo, ayc_cl)
        g0 = jnp.where(use, 1.0 / l_y, 1.0)
        g1 = jnp.where(use, (0.5 - a_y * th) / l_y - 0.5, 0.0)
        m_out = m_out.at[:, 1, :].set(
            m_out[:, 1, :] * g0[:, None]
            + m_out[:, 2, :] * g1[:, None])
        vl = jnp.where(use, 0.0, vl)
        vu = jnp.where(use, 1.0, vu)
        sig_yhat = jnp.where(use, 2e-3, sig_yhat)

    return (ayc_cl, bxc_cl, m_out, ul, uu, vl, vu, sig_xhat, sig_yhat)


def _raster_bucket_fourier(b: BucketSpec, fourier, t_sel, m_sel, wh_c,
                           offx, offy, sigma, tex_hw,
                           apply_defocus: bool,
                           band=None, modal: bool = True) -> jnp.ndarray:
    """Analytic rasterization from the separable DCT streak bank.

    No gathers — the patch is one cosine-series evaluation per pixel
    (VPU); see :func:`fourier_drop_coefficients` for the damping.
    """
    th, tw = tex_hw
    (ayc, bxc, m_out, ul, uu, vl, vu, sig_x, sig_y) = \
        fourier_drop_coefficients(
            b, fourier, t_sel, m_sel, wh_c, sigma, tex_hw,
            apply_defocus, band=band, modal=modal)

    lx, ly, tx, ty = _patch_tex_coords(b.ph, b.pw, m_out, offx, offy)
    xhat = (tx + 0.5) / tw
    yhat = (ty + 0.5) / th
    ul = ul[:, None, None]
    uu = uu[:, None, None]
    vl = vl[:, None, None]
    vu = vu[:, None, None]

    # Content window: the true patch is blur(T * 1_rect) — the warped
    # texture, zero outside its support (warpPerspective / rotate_bound
    # pad with zeros: generator.py:130-171), convolved with the defocus
    # Gaussian (+ the resize footprint). We model it as
    # blur_mirror(T) * blur(1_rect): the mirror-extended DCT series
    # (spectrally damped) times the blurred indicator of the TEXTURE
    # RECT in normalized texture coordinates. sig_xhat/sig_yhat are the
    # patch blur projected through the warp Jacobian into those
    # coordinates — exactly the damping sigmas — so the window's edge
    # decay in patch space is sqrt(sigma^2 + 1/12) px, the Gaussian
    # spill plus INTER_AREA's half-pixel softening, and its integral is
    # the rect area: mass is conserved for any blur. (The round-3 first
    # cut bounded a PATCH-space box window instead; on rotated thin
    # streaks the content box is the rotate_bound canvas whose zero
    # corners the mirror basis filled with streak-mean energy — a
    # measured 1.76x per-drop mass excess vs the real reference at
    # 5.7 deg rotation. The texture-rect window zeroes those corners by
    # construction.)
    # Band bounds: [0,1]^2 for SM / unclipped drops; the image-clipped
    # canvas box for Big drops (see _tex_band — the reference crops the
    # warped content BEFORE the blur, so clipped content must not
    # contribute even through its blur skirt); [0,1] at a sharp edge
    # sigma for modal-blur axes (the blurred profile carries its own
    # decay). All from fourier_drop_coefficients.
    erf = tanh_erf
    sqrt2 = 1.4142135
    sx = jnp.maximum(sig_x, 2e-3)[:, None, None]
    sy = jnp.maximum(sig_y, 2e-3)[:, None, None]
    win = (0.5 * (erf((xhat - ul) / (sqrt2 * sx))
                  - erf((xhat - uu) / (sqrt2 * sx)))
           * 0.5 * (erf((yhat - vl) / (sqrt2 * sy))
                    - erf((yhat - vu) / (sqrt2 * sy))))
    # Hard bound: the tanh-erf window is < ALPHA_CUTOFF beyond ~3.5
    # sigma outside the rect, so this only guards far mirror copies.
    mx = 0.25 + 4.0 * sx
    my = 0.25 + 4.0 * sy
    win = jnp.where((xhat >= ul - mx) & (xhat <= uu + mx)
                    & (yhat >= vl - my) & (yhat <= vu + my), win, 0.0)

    uy = _eval_dct_rank_series(ayc, yhat)
    vx = _eval_dct_rank_series(bxc, xhat)
    g = uy[0] * vx[0]
    for r in range(1, ayc.shape[1]):
        g = g + uy[r] * vx[r]
    g = jnp.clip(g, 0.0, 1.0) * win
    return jnp.where(g > ALPHA_CUTOFF, g, 0.0)


def _route_buckets(drops: DropBatch, geom: DropGeometry,
                   cfg: RasterConfig):
    """Assign every drop to the first bucket it fits (blur spill
    included); the last bucket takes the remainder (clipped)."""
    n = drops.ip1.shape[0]
    spill = jnp.floor(4.0 * geom.sigma + 0.5).astype(jnp.int32)
    need_w = geom.content_wh[:, 0] + 2.0 * spill.astype(jnp.float32)
    need_h = geom.content_wh[:, 1] + 2.0 * spill.astype(jnp.float32)
    fits = []
    for b in cfg.buckets:
        fits.append((need_w <= b.pw) & (need_h <= b.ph)
                    & (geom.sigma * 4.0 <= b.radius))
    bucket_id = jnp.full((n,), len(cfg.buckets) - 1, jnp.int32)
    for bi in range(len(cfg.buckets) - 2, -1, -1):
        bucket_id = jnp.where(fits[bi], bi, bucket_id)
    return bucket_id


def raster_params_frame(drops: DropBatch,
                        geom: DropGeometry,
                        tex_hw,
                        tex_idx: jnp.ndarray,
                        image_wh,
                        cfg: RasterConfig,
                        apply_defocus: bool,
                        fourier,
                        field_sublane: int = 8):
    """Per-bucket parameter tensors for the fused Pallas kernel
    (ops/pallas/fused_kernel): geometry rows of the (N_PARAMS, C) param
    matrix (blend/saturation rows stay zero for the caller to fill),
    raw anchors, damped DCT coefficients, validity. No patch is
    materialized.

    For strip-mode buckets the x anchor is the CONTENT strip start
    (clip(floor(mincx) - strip_pad, 0, W)) rather than minC - shift:
    the kernel lane-aligns it down to the drop's own lane tile, so
    drops whose content + tails fit that single tile — flagged 0 in
    the per-bucket ``wide`` row — qualify for the narrow window DMA
    (half the window bytes; fused_kernel NARROW MODE). Both bases
    satisfy the strip contract (content in [ax + s, ax + s + 128));
    ``field_sublane`` must match the field-plane dtype's sublane (8
    f32 / 16 bf16) so the strip/plan decision here agrees with the
    render caller's.
    """
    from raintpu.ops.pallas.fused_kernel import (LANE as _LANE,
                                                 bucket_strip_pad)

    w_img, h_img = image_wh
    bucket_id = _route_buckets(drops, geom, cfg)

    out = []
    for bi, b in enumerate(cfg.buckets):
        mask = drops.valid & (bucket_id == bi)
        idx, sel_valid, overflow = _compact(mask, b.capacity)

        m_sel = geom.M[idx]
        minc = geom.min_c[idx]
        sigma = jnp.minimum(geom.sigma[idx], b.radius / 4.0)
        shift = jnp.minimum(geom.shift[idx], b.radius)
        wh_c = geom.content_wh[idx]
        t_sel = tex_idx[idx]

        a = minc - shift[:, None].astype(minc.dtype)
        ay = jnp.clip(a[:, 1], 0.0, float(h_img)).astype(jnp.int32)
        pad = bucket_strip_pad(b.ph, b.pw, b.radius, field_sublane)
        if pad:
            span = b.pw + 2 * pad
            ax = jnp.clip(jnp.floor(minc[:, 0]) - pad, 0.0,
                          float(w_img)).astype(jnp.int32)
            wide = ((ax % _LANE) + span > _LANE).astype(jnp.int32)
        else:
            ax = jnp.clip(a[:, 0], 0.0, float(w_img)).astype(jnp.int32)
            wide = jnp.ones_like(ax)

        (ayc, bxc, m_out, ul, uu, vl, vu, sig_x, sig_y) = \
            fourier_drop_coefficients(
                b, fourier, t_sel, m_sel, wh_c, sigma, tex_hw,
                apply_defocus, band=geom.band[idx],
                modal=cfg.modal_blur)
        # Zero coefficients of invalid slots (cheap belt + braces on top
        # of the kernel's count gate).
        ayc = jnp.where(sel_valid[:, None, None], ayc, 0.0)

        m = m_out.reshape(-1, 9)
        zeros = jnp.zeros_like(sig_x)
        params = jnp.stack([
            m[:, 0], m[:, 1], m[:, 2], m[:, 3], m[:, 4], m[:, 5],
            m[:, 6], m[:, 7], m[:, 8],
            minc[:, 0], minc[:, 1], wh_c[:, 0], wh_c[:, 1],
            sig_x, sig_y,
            zeros, zeros, zeros, zeros,    # lo, add_rgb (caller fills)
            zeros, zeros, zeros,           # sat_rgb (caller fills)
            ul, uu, vl, vu,
        ], axis=0)                                       # (N_PARAMS, C)
        out.append(dict(params=params,
                        anchor=jnp.stack([ax, ay], -1),
                        wide=wide,
                        ayc=ayc, bxc=bxc, drop_idx=idx,
                        valid=sel_valid, overflow=overflow))
    return out


def rasterize_frame_drops(drops: DropBatch,
                          geom: DropGeometry,
                          textures: jnp.ndarray,
                          tex_idx: jnp.ndarray,
                          image_wh: Tuple[int, int],
                          cfg: RasterConfig,
                          apply_defocus: bool,
                          fourier=None) -> Tuple[RasterBucket, ...]:
    """Route drops into size buckets and rasterize + defocus-blur each.

    ``fourier``: (ay, bx) DCT coefficient arrays (K, R, M)/(K, R, N)
    from :func:`raintpu.data.textures.factorize_streak_db` — required
    when cfg.texture_mode == "fourier".
    Returns one RasterBucket per cfg.buckets entry.
    """
    w_img, h_img = image_wh
    bucket_id = _route_buckets(drops, geom, cfg)

    out = []
    for bi, b in enumerate(cfg.buckets):
        mask = drops.valid & (bucket_id == bi)
        idx, sel_valid, overflow = _compact(mask, b.capacity)

        m_sel = geom.M[idx]
        minc = geom.min_c[idx]
        sigma = jnp.minimum(geom.sigma[idx], b.radius / 4.0)
        shift = jnp.minimum(geom.shift[idx], b.radius)
        wh_c = geom.content_wh[idx]
        t_sel = tex_idx[idx]

        # Patch anchor: clip(minC - shift, 0, image) — reference
        # bad_weather.py:418-422 (the delta-crop is folded into `off`).
        a = minc - shift[:, None].astype(minc.dtype)
        ax = jnp.clip(a[:, 0], 0.0, float(w_img)).astype(jnp.int32)
        ay = jnp.clip(a[:, 1], 0.0, float(h_img)).astype(jnp.int32)
        offx = minc[:, 0] - ax.astype(minc.dtype)   # content start in patch
        offy = minc[:, 1] - ay.astype(minc.dtype)

        if cfg.texture_mode == "fourier" and fourier is not None:
            g = _raster_bucket_fourier(
                b, fourier, t_sel, m_sel, wh_c, offx, offy, sigma,
                textures.shape[1:], apply_defocus, band=geom.band[idx],
                modal=cfg.modal_blur)
        else:
            g = _raster_bucket_gather(
                b, cfg.supersample, textures, t_sel, m_sel, wh_c,
                offx, offy)
            if apply_defocus:
                g = variable_separable_blur(g, sigma, sigma / 2.0,
                                            b.radius)

        g = jnp.where(sel_valid[:, None, None], g, 0.0)
        out.append(RasterBucket(
            patches=g, anchor=jnp.stack([ax, ay], -1),
            drop_idx=idx, valid=sel_valid, overflow=overflow))
    return tuple(out)


def _fit_series(ph: int, radius: int) -> Tuple[int, int, int]:
    """(modes_y, modes_x, ranks) series truncation for a fitted rung.

    Small patches carry no high-frequency content worth evaluating and
    heavily defocused big ones have their high modes damped to ~0 by
    the Gaussian mode damping; the SVD rank axis is energy-ordered and
    ranks 5-6 add < 0.001 relative rmse even unblurred. Measured
    (round 3, KITTI-like scene vs a full-series render): the
    aggressive small-rung setting is visually identical (mask IoU
    0.996, image mean |diff| 6e-6 — two orders below the golden parity
    tolerance) and worth ~8% end-to-end."""
    if ph <= 48:
        return 12, 6, 3
    if radius >= 16:
        return 16, 8, 4
    return 24, 10, 4


def fit_raster_config(drops: DropBatch, tex_hw, image_wh, settings, *,
                      quantiles=(0.78, 0.95, 0.995),
                      capacity_headroom: float = 1.3,
                      capacity_slack: int = 16,
                      tail_margin: float = 1.15,
                      supersample: int = 2,
                      texture_mode: str = "fourier",
                      series_fn=None) -> RasterConfig:
    """Fit a bucket ladder to a sampled drop population (host-side).

    The hand-tuned ladders carried a giant (320, 192, 32) rung "just in
    case"; the round-3 distribution probe showed it catches nothing at
    any benched intensity while costing ~28.7 us/drop on its multi-tile
    window (4.2x a fitted single-tile rung) — fitting the ladder to the
    measured population lifted the headline 1094.8 -> 1617.4 img/s.

    Per drop we compute the needed window (content + 4-sigma blur
    spill, exactly the `_route_buckets` formula), place ladder rungs at
    population quantiles, and snap each rung's width OUT to its
    cost-free bound: a strip-mode bucket evaluates (tile_h, 128) lanes
    regardless of pw, and a full-width bucket's DMA window is pw2 =
    (floor(pw/128)+2)*128 — widening pw up to those edges costs nothing
    and pulls drops down from bigger rungs. The last rung covers the
    sampled max times ``tail_margin`` (drops beyond it are clipped to
    the rung, exactly like the old giant bucket clipped its stragglers,
    and bucket-overflow counters still fire on capacity misfits).

    ``settings``: any object with .camera.{focal_m,f_number},
    .focus_plane, .rendering_strategy, .noise_scale, .noise_std
    (render.camera.RenderSettings matches; duck-typed so ops/ needs no
    render/ import). ``drops``: a BATCHED DropBatch sample — capacities
    are sized from per-frame max occupancy * ``capacity_headroom`` +
    ``capacity_slack``.
    """
    import numpy as np

    cam = settings.camera
    physics = settings.rendering_strategy is None
    noise_max = 3.0 * float(settings.noise_std) * float(settings.noise_scale)

    def needs_one(d, noise_deg):
        n = d.ip1.shape[0]
        g = drop_geometry(
            d, tuple(tex_hw), tuple(image_wh), focal_m=cam.focal_m,
            f_number=cam.f_number, focus_plane=settings.focus_plane,
            coc_pixsize=4.65e-6, apply_defocus=physics,
            noise_deg=jnp.full((n,), noise_deg, jnp.float32))
        spill = jnp.floor(4.0 * g.sigma + 0.5)
        return (g.content_wh[:, 0] + 2.0 * spill,
                g.content_wh[:, 1] + 2.0 * spill, 4.0 * g.sigma)

    def needs(d):
        nw, nh, s4 = needs_one(d, 0.0)
        if noise_max > 0.0:
            for nz in (-noise_max, noise_max):
                nw2, nh2, s42 = needs_one(d, nz)
                nw = jnp.maximum(nw, nw2)
                nh = jnp.maximum(nh, nh2)
                s4 = jnp.maximum(s4, s42)
        return nw, nh, s4, d.valid

    nw, nh, s4, valid = (np.asarray(x) for x in
                         jax.jit(jax.vmap(needs))(drops))
    v = valid.astype(bool)
    if not v.any():
        return RasterConfig(buckets=RasterConfig.default(64).buckets,
                            supersample=supersample,
                            texture_mode=texture_mode)
    nwv, nhv, s4v = nw[v], nh[v], s4[v]

    def rung(q):
        if q >= 1.0:
            ph_raw = float(nhv.max()) * tail_margin
            pw_raw = float(nwv.max()) * tail_margin
            r = int(np.ceil(s4v.max() * tail_margin))
        else:
            ph_raw = float(np.quantile(nhv, q))
            pw_raw = float(np.quantile(nwv, q))
            r = int(np.ceil(np.quantile(s4v, q)))
        r = max(r, 2)
        ph = int(-(-max(ph_raw, 8.0) // 8) * 8)
        # Width snapping (cost-free widening; see docstring). LANE=128
        # and the bounds mirror ops/pallas/fused_kernel +
        # render/frame's strip/pair eligibility: pad = 1.25*radius + 2.
        # The PAIR bound (64 - 2*pad) comes first: a rung at or under
        # it evaluates two drops per series eval (the kernel's VPU
        # roofline), so widening past it is NOT free — only widening
        # up to it, or between it and the strip bound, is.
        pad = int(1.25 * r) + 2
        pair_bound = 64 - 2 * pad
        strip_bound = 128 - 2 * pad
        if pw_raw <= pair_bound:
            pw = pair_bound
        elif pw_raw <= strip_bound:
            pw = strip_bound
        else:
            pw = int(-(-pw_raw // 128) * 128)
        return ph, pw, r

    rungs = [rung(q) for q in tuple(quantiles) + (1.0,)]
    # Deduplicate: keep a rung only if it is strictly smaller than the
    # next in some dimension (first-fit makes an equal-or-bigger
    # earlier rung shadow the later one).
    kept = []
    for i, rg in enumerate(rungs):
        if i + 1 < len(rungs):
            nxt = rungs[i + 1]
            if rg[0] >= nxt[0] and rg[1] >= nxt[1] and rg[2] >= nxt[2]:
                continue
        if kept and kept[-1] == rg:
            continue
        kept.append(rg)

    # First-fit routing (the _route_buckets formula) -> per-frame max
    # occupancy -> capacities.
    bid = np.full(nw.shape, len(kept) - 1, np.int32)
    for bi in range(len(kept) - 2, -1, -1):
        ph, pw, r = kept[bi]
        fit = (nw <= pw) & (nh <= ph) & (s4 <= r)
        bid = np.where(fit, bi, bid)
    specs = []
    for bi, (ph, pw, r) in enumerate(kept):
        occ = int(((bid == bi) & v).sum(axis=1).max())
        cap = max(8, int(occ * capacity_headroom) + capacity_slack)
        cap = int(-(-cap // 8) * 8)
        my, mx, ranks = (series_fn or _fit_series)(ph, r)
        specs.append(BucketSpec(ph, pw, r, cap, my, mx, ranks))
    return RasterConfig(buckets=tuple(specs), supersample=supersample,
                        texture_mode=texture_mode)
