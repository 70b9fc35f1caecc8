import math

import numpy as np
import jax.numpy as jnp
import cv2

from raintpu.ops import fog


def np_fog(image, depth, rain_intensity, f_number, exposure_s, gain,
           angle_deg=90.0):
    """Independent numpy+cv2 transcription of the Weber-2015 fog model as
    used by the reference (add_attenuation.py) for golden comparison."""
    beta_ext = 0.312 * rain_intensity ** 0.67
    f_ext = np.exp(-beta_ext * depth / 1000.0)[..., None].repeat(3, -1)
    irr = 4 * f_number ** 2 * image / (exposure_s * gain * np.pi)
    irr_mean = irr.reshape(-1, 3).mean(0)
    g = 0.97
    cos_t = math.cos(math.radians(angle_deg))
    beta_hg = (1 - g ** 2) / (4 * np.pi * (1 + g ** 2 - 2 * g * cos_t) ** 1.5)
    l_in = np.clip(beta_hg * irr_mean * (1 - f_ext), 0, 1)
    f_ext_b = cv2.GaussianBlur(f_ext.astype(np.float32), (25, 25), 25)
    l_in_b = cv2.GaussianBlur(l_in.astype(np.float32), (25, 25), 25)
    return np.clip(image * f_ext_b + l_in_b, 0, 1)


def test_fog_matches_reference_math(rng):
    img = rng.rand(48, 64, 3).astype(np.float32)
    depth = (rng.rand(48, 64).astype(np.float32) * 80 + 2)
    got = np.asarray(fog.fog_rain_layer(
        jnp.asarray(img), jnp.asarray(depth),
        rain_intensity=25.0, f_number=6.0, exposure_s=2e-3,
        camera_gain=20.0))
    want = np_fog(img.astype(np.float64), depth, 25.0, 6.0, 2e-3, 20.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fog_washes_out_far_pixels_toward_airlight():
    # Far pixels lose surface radiance (extinction) and gain in-scattered
    # airlight; near pixels stay close to the original.
    img = np.full((32, 48, 3), 0.1, np.float32)
    depth = np.full((32, 48), 2.0, np.float32)
    depth[:, 24:] = 5000.0
    out = np.asarray(fog.fog_rain_layer(
        jnp.asarray(img), jnp.asarray(depth),
        rain_intensity=50.0, f_number=6.0, exposure_s=2e-3,
        camera_gain=20.0))
    near = out[16, 2, 0]
    far = out[16, 45, 0]
    assert abs(near - 0.1) < 0.05          # near ~ unchanged
    assert far > near + 0.05               # far gains airlight glow


def test_fog_zero_intensity_near_identity():
    img = np.full((16, 16, 3), 0.5, np.float32)
    depth = np.full((16, 16), 10.0, np.float32)
    out = np.asarray(fog.fog_rain_layer(
        jnp.asarray(img), jnp.asarray(depth),
        rain_intensity=0.0, f_number=6.0, exposure_s=2e-3,
        camera_gain=20.0))
    # beta_ext = 0 -> f_ext = 1, l_in = 0 -> unchanged.
    np.testing.assert_allclose(out, img, atol=1e-5)
