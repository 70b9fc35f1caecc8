"""Volumetric fog-like rain attenuation (Weber et al. 2015 model).

TPU-native equivalent of the reference's ``common/add_attenuation.py``
(class ``FogRain``): given a clear image and per-pixel depth, apply
extinction + Henyey-Greenstein in-scattering:

    beta_ext = 0.312 * R^0.67                      (Weber 2015)
    f_ext    = exp(-beta_ext * depth_km)
    E        = 4 N^2 I / (t_exp * gain * pi)       (Garg-Nayar irradiance)
    beta_hg  = (1-g^2) / (4 pi (1+g^2-2g cos a)^1.5),  g = 0.97
    L_in     = clip(beta_hg * mean(E) * (1 - f_ext), 0, 1)
    L        = clip(I * blur(f_ext) + blur(L_in), 0, 1)

where blur is the reference's 25x25 sigma-25 Gaussian
(``add_attenuation.py:79-80``). Everything is elementwise + one separable
convolution — pure XLA, fuses into the surrounding frame pipeline.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from raintpu.ops.blur import cv2_gaussian_kernel, separable_blur_hw

HG_G = 0.97                     # Henyey-Greenstein asymmetry (reference :58)
FOG_BLUR_KSIZE = 25             # reference add_attenuation.py:79
FOG_BLUR_SIGMA = 25.0


def beta_ext(rain_intensity) -> float:
    """Extinction coefficient (km^-1) for fall rate R (mm/hr)."""
    return 0.312 * float(rain_intensity) ** 0.67


def beta_hg(angle_deg: float, g: float = HG_G) -> float:
    """Henyey-Greenstein phase (Weber 2015 eq. 10)."""
    cos_term = math.cos(math.radians(angle_deg))
    return (1.0 - g ** 2) / (4.0 * math.pi *
                             (1.0 + g ** 2 - 2.0 * g * cos_term) ** 1.5)


def fog_rain_layer(image: jnp.ndarray,
                   depth: jnp.ndarray,
                   *,
                   rain_intensity: float,
                   f_number: float,
                   exposure_s: float,
                   camera_gain: float,
                   angle_deg: float = 90.0,
                   use_pallas_blur: bool = False) -> jnp.ndarray:
    """Apply fog-like rain attenuation. image (..., H, W, 3) [0,1];
    depth (..., H, W) m — leading batch dims are handled natively (the
    mean-irradiance reduction is per frame).

    Static parameters are Python floats (baked at trace time, as the
    reference instantiates FogRain once per weather, ``generator.py:272``).

    ``use_pallas_blur``: run the 25-tap blur through the fused Pallas
    stencil kernel (ops.pallas.blur_kernel) — an ACCURACY option, not
    the production path (production keeps the in-vmap XLA blur: the
    round-4 hoist measured net-slower, see fused_field_planes). The
    kernel's split-float matmuls are ~2e-6 vs f64 where the XLA blur's
    TPU matmuls bf16-truncate operands (~1e-3); the tested agreement
    bound between the two paths is ~1e-5 (tests/test_blur_pallas.py).
    Only valid OUTSIDE vmap (the caller flattens batch dims here);
    interpret-tested and hardware-value-gated.
    """
    b_ext = beta_ext(rain_intensity)
    f_ext = jnp.exp((-b_ext) * (depth / 1000.0))           # (..., H, W)

    irr = (4.0 * f_number ** 2 * image) / (exposure_s * camera_gain * math.pi)
    irr_mean = jnp.mean(irr, axis=(-3, -2))                # (..., 3)

    c = beta_hg(angle_deg) * irr_mean                      # (..., 3)
    l_in = jnp.clip(c[..., :, None, None]
                    * (1.0 - f_ext)[..., None, :, :], 0.0, 1.0)

    kernel = cv2_gaussian_kernel(FOG_BLUR_KSIZE, FOG_BLUR_SIGMA)
    # One 4-channel blur: [f_ext, l_in_rgb]. The reference blurs a
    # 3-channel broadcast of f_ext (add_attenuation.py:79) — blurring
    # the same channel three times; one channel is bit-equivalent.
    # CHANNEL-MAJOR (..., 4, H, W): the blur matmuls contract over the
    # (8,128)-tiled image dims. The previous channels-last (H, W, 4)
    # stack put C=4 in the lane dim — 4/128 lane occupancy on every
    # blur operand, measured ~5x off roofline on v5e (fog was 40% of
    # the honest step).
    stacked = jnp.concatenate([f_ext[..., None, :, :], l_in], axis=-3)
    if use_pallas_blur:
        from raintpu.ops.pallas.blur_kernel import separable_blur_pallas
        h, w = stacked.shape[-2:]
        blurred = separable_blur_pallas(
            stacked.reshape(-1, h, w), kernel).reshape(stacked.shape)
    else:
        blurred = separable_blur_hw(stacked, kernel)
    f_ext_b = blurred[..., 0, :, :]                        # (..., H, W)
    l_in_b = jnp.moveaxis(blurred[..., 1:, :, :], -3, -1)  # (..., H, W, 3)

    return jnp.clip(image * f_ext_b[..., None] + l_in_b, 0.0, 1.0)
