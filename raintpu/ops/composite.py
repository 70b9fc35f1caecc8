"""Order-independent photometric compositing of rasterized drops.

The reference blends drops sequentially in place
(``bad_weather.py:429-460``):

    rainy = (1 - alpha(px) * tau_one / t_exp) * rainy + tex(px) * tau_one/tau_zero
    mask  += alpha(px)

which is drop-order dependent (acknowledged in the reference's own
comment, ``:436-438``). TPU-native redesign: expand the recurrence —

    rainy_N = (prod_i f_i) * rainy_0 + sum_i [ add_i * prod_{j>i} f_j ]

with f_i = 1 - alpha_i * lo_i and add_i the drop's additive term. Since
per-pixel attenuations are small and drop overlaps sparse, the cross
terms are dropped:

    rainy ~= exp(sum_i log f_i) * rainy_0 + sum_i add_i

making the whole composite THREE scatter-adds (log-attenuation,
additive RGB, alpha) — order-independent, hence batchable/shardable over
drops with a plain sum reduction. The rain mask (sum of alphas) is
*exactly* the reference quantity. Divergence is bounded by overlap
density and validated against tolerance in tests.

Scatter-adds run over drop chunks (lax.map) to bound index-buffer
memory; a fused Pallas kernel is the planned fast path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from raintpu.ops.rasterize import RasterBucket

# tau_zero = sqrt(1.16e-3) / 50 — Garg-Nayar drop size constant
# ("Photorealistic Rendering of Rain Streaks" sec. 4; reference
# bad_weather.py:345,351).
DROP_SIZE = 1.16e-3
TAU_ZERO = math.sqrt(DROP_SIZE) / 50.0
LOG_EPS = 1e-6


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FieldMaps:
    """Accumulated drop fields over the image."""

    log_att: jnp.ndarray   # (H, W)  sum_i log(1 - alpha_i * lo_i)
    additive: jnp.ndarray  # (H, W, 3) sum_i tex_i * color_i * tau1/tau0
    alpha: jnp.ndarray     # (H, W)  sum_i alpha_i — the rain mask
    # (H, W, 3) sum_i clip(tex_i * color_i, 0, 1) — the reference's
    # rainy_saturation_mask (bad_weather.py:450-460); None unless
    # PipelineConfig.compute_saturation_mask.
    sat: Optional[jnp.ndarray] = None


def blend_coefficients(iw1: jnp.ndarray, iw2: jnp.ndarray,
                       length: jnp.ndarray,
                       *,
                       exposure_s: float,
                       opacity_attenuation: float,
                       rendering_strategy) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-drop (lo, add_scale): attenuation slope and additive gain.

    Physics path (reference bad_weather.py:424-427):
        d_avg = (iw1 + iw2)/2
        lo    = opacity_attenuation * d_avg / (length + d_avg)
        tau1  = t_exp * lo ;  attenuation = 1 - alpha * tau1/t_exp
        add   = tex_rgb * tau1 / tau0

    'white' (:349-353): lo = 1, no opacity_attenuation.
    'naive_db' (:354-360): lo = d_avg / (length + d_avg) — implemented as
    *intended*; the reference's own naive_db branch crashes per-drop on a
    misspelled attribute (``drop_dict.imageDiameterStart``) and silently
    renders nothing.
    """
    d_avg = (iw1 + iw2) / 2.0
    lf = length.astype(d_avg.dtype)
    if rendering_strategy == "white":
        lo = jnp.ones_like(d_avg)
    elif rendering_strategy == "naive_db":
        lo = d_avg / (lf + d_avg)
    else:
        lo = opacity_attenuation * d_avg / (lf + d_avg)
    add_scale = exposure_s * lo / TAU_ZERO
    return lo, add_scale


def _scatter_bucket(fields: FieldMaps,
                    bucket: RasterBucket,
                    lo: jnp.ndarray,
                    add_rgb: jnp.ndarray,
                    sat_rgb: Optional[jnp.ndarray] = None,
                    chunk: int = 0) -> FieldMaps:
    """Scatter one bucket's patches into padded field maps.

    fields maps are padded to (H + PH, W + PW) by the caller so anchors
    (clipped to [0, W] x [0, H]) can never go out of bounds.
    lo: (C,) attenuation slope; add_rgb: (C, 3) additive gain per drop;
    sat_rgb: (C, 3) pre-tau drop color (saturation mask) or None.

    Drops scatter in chunks sized so the transient (chunk, PH, PW, 3)
    value/index buffers stay ~8 M elements regardless of bucket patch
    size (a fixed chunk count OOMs for the big-streak buckets).
    """
    c, ph, pw = bucket.patches.shape
    hp, wp = fields.alpha.shape
    if chunk <= 0:
        chunk = max(8, min(c, 8_388_608 // (ph * pw)))

    ii = jnp.arange(ph, dtype=jnp.int32)
    jj = jnp.arange(pw, dtype=jnp.int32)

    n_chunks = max(1, -(-c // chunk))
    pad_to = n_chunks * chunk

    def padc(a):
        return jnp.pad(a, ((0, pad_to - c),) + ((0, 0),) * (a.ndim - 1))

    patches = padc(bucket.patches).reshape(n_chunks, chunk, ph, pw)
    anchors = padc(bucket.anchor).reshape(n_chunks, chunk, 2)
    lo_c = padc(lo).reshape(n_chunks, chunk)
    add_c = padc(add_rgb).reshape(n_chunks, chunk, 3)
    with_sat = sat_rgb is not None and fields.sat is not None
    sat_c = padc(sat_rgb).reshape(n_chunks, chunk, 3) if with_sat \
        else jnp.zeros_like(add_c)

    def body(carry, xs):
        log_att, additive, alpha, sat = carry
        p, a, l, ag, sg = xs
        rows = a[:, 1, None, None] + ii[None, :, None]   # (chunk, ph, 1)
        cols = a[:, 0, None, None] + jj[None, None, :]   # (chunk, 1, pw)
        idx = (rows * wp + cols).reshape(-1)             # (chunk*ph*pw,)

        att = jnp.log(jnp.maximum(1.0 - p * l[:, None, None], LOG_EPS))
        log_att = log_att.reshape(-1).at[idx].add(att.reshape(-1)).reshape(hp, wp)
        alpha = alpha.reshape(-1).at[idx].add(p.reshape(-1)).reshape(hp, wp)
        addv = p[..., None] * ag[:, None, None, :]       # (chunk, ph, pw, 3)
        additive = additive.reshape(-1, 3).at[idx].add(
            addv.reshape(-1, 3)).reshape(hp, wp, 3)
        if with_sat:
            # Reference: rainy_saturation_mask += clip(drop_rgb, 0, 1)
            # per drop (bad_weather.py:452-453,459-460).
            satv = jnp.clip(p[..., None] * sg[:, None, None, :], 0.0, 1.0)
            sat = sat.reshape(-1, 3).at[idx].add(
                satv.reshape(-1, 3)).reshape(hp, wp, 3)
        return (log_att, additive, alpha, sat), None

    sat0 = fields.sat if with_sat else jnp.zeros((1, 1, 3), jnp.float32)
    (log_att, additive, alpha, sat), _ = jax.lax.scan(
        body, (fields.log_att, fields.additive, fields.alpha, sat0),
        (patches, anchors, lo_c, add_c, sat_c))
    return FieldMaps(log_att=log_att, additive=additive, alpha=alpha,
                     sat=sat if with_sat else fields.sat)


def composite_drops(image_hw: Tuple[int, int],
                    buckets: Sequence[RasterBucket],
                    lo_all: jnp.ndarray,
                    add_rgb_all: jnp.ndarray,
                    sat_rgb_all: Optional[jnp.ndarray] = None,
                    dtype=jnp.float32) -> FieldMaps:
    """Accumulate all buckets into (H, W) field maps.

    lo_all / add_rgb_all / sat_rgb_all are per-*frame-drop* arrays
    (N,) / (N, 3) / (N, 3 | None); bucket rows gather their own drops
    via ``drop_idx``.
    """
    h, w = image_hw
    max_ph = max(b.patches.shape[1] for b in buckets)
    max_pw = max(b.patches.shape[2] for b in buckets)
    hp, wp = h + max_ph, w + max_pw

    with_sat = sat_rgb_all is not None
    fields = FieldMaps(
        log_att=jnp.zeros((hp, wp), dtype),
        additive=jnp.zeros((hp, wp, 3), dtype),
        alpha=jnp.zeros((hp, wp), dtype),
        sat=jnp.zeros((hp, wp, 3), dtype) if with_sat else None)

    for b in buckets:
        # where(), not multiply: invalid rows may carry NaN/inf payloads
        # (degenerate geometry) and NaN * 0 would still poison the sums.
        lo = jnp.where(b.valid, lo_all[b.drop_idx], 0.0)
        add = jnp.where(b.valid[:, None], add_rgb_all[b.drop_idx], 0.0)
        sat = jnp.where(b.valid[:, None], sat_rgb_all[b.drop_idx], 0.0) \
            if with_sat else None
        fields = _scatter_bucket(fields, b, lo, add, sat)

    return FieldMaps(log_att=fields.log_att[:h, :w],
                     additive=fields.additive[:h, :w],
                     alpha=fields.alpha[:h, :w],
                     sat=fields.sat[:h, :w] if with_sat else None)


def blend(fogged: jnp.ndarray, fields: FieldMaps) -> jnp.ndarray:
    """Final blend: attenuate the fogged background and add drop light."""
    att = jnp.exp(fields.log_att)[..., None]
    return jnp.clip(att * fogged + fields.additive, 0.0, 1.0)
