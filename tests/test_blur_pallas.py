"""Fused Pallas stencil blur (ops/pallas/blur_kernel) vs the XLA
banded-matmul blur and the cv2-semantics oracle.

The kernel is an ACCURACY option reachable via render.frame.batched_fog
(production keeps the in-vmap XLA blur — the round-4 hoist measured
net-slower on v5e; see fused_field_planes). These interpret-mode tests
pin its values to the proven XLA blur across edge geometries
(non-multiple-of-128 widths, short bands, both fog and feather kernel
sizes), and the batched fog wrapper to the per-frame reference
formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raintpu.ops.blur import cv2_gaussian_kernel, separable_blur_hw
from raintpu.ops.pallas.blur_kernel import (pallas_blur_supported,
                                            separable_blur_pallas)


@pytest.mark.parametrize("n,h,w,ksize,sigma", [
    (3, 40, 200, 11, 3.0),       # small band, short W
    (2, 90, 1242, 25, 25.0),     # fog kernel at KITTI width
    (1, 17, 130, 15, 2.0),       # H barely over r, W just past a tile
    (2, 64, 120, 7, 1.5),        # sub-tile W
    (1, 375, 384, 25, 25.0),     # KITTI H, exact tile multiple W
])
def test_pallas_blur_matches_xla(n, h, w, ksize, sigma):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, h, w).astype(np.float32))
    k = cv2_gaussian_kernel(ksize, sigma)
    assert pallas_blur_supported(x.shape, ksize // 2)
    ref = separable_blur_hw(x, k)
    out = separable_blur_pallas(x, k, interpret=True)
    # Bound: the split-float band matmuls carry a ~2^-17-relative
    # residual (all four bf16 cross terms kept, f32 accumulate).
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-5


def test_pallas_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    x = rng.rand(48, 300).astype(np.float32)
    k = cv2_gaussian_kernel(25, 25.0)
    ref = cv2.GaussianBlur(x, (25, 25), 25.0)
    out = np.asarray(separable_blur_pallas(
        jnp.asarray(x)[None], k, interpret=True))[0]
    assert np.max(np.abs(ref - out)) < 1e-5


def test_supported_gate():
    # multi-fold reflection and oversized radii must be rejected
    assert not pallas_blur_supported((1, 10, 200), 12)   # r >= h
    assert not pallas_blur_supported((1, 200, 10), 12)   # r >= w
    assert not pallas_blur_supported((1, 200, 200), 65)  # r > 64
    assert pallas_blur_supported((1, 200, 200), 12)


def test_batched_fog_matches_per_frame():
    """render.frame.batched_fog (XLA path) == vmapped per-frame fog."""
    from raintpu.ops import fog as fog_ops
    from raintpu.render.camera import CameraSettings, RenderSettings
    from raintpu.render.frame import PipelineConfig, batched_fog
    from raintpu.ops.rasterize import BucketSpec, RasterConfig

    rng = np.random.RandomState(2)
    B, H, W = 3, 48, 160
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W) * 50 + 2).astype(np.float32))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    cfg = PipelineConfig(
        settings=settings, image_hw=(H, W), fallrate=25.0,
        raster=RasterConfig(buckets=(BucketSpec(24, 32, 5, 16),)))
    cam = settings.camera
    ref = jax.vmap(lambda b, d: fog_ops.fog_rain_layer(
        b, d, rain_intensity=25.0, f_number=cam.f_number,
        exposure_s=cam.exposure_s, camera_gain=cam.gain))(bg, depth)
    out = batched_fog(bg, depth, cfg)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-6


def test_generate_envmap_batch_matches_vmap():
    """Batched envmap (full-lane contractions) == per-frame path."""
    from raintpu.ops import envmap as envmap_ops

    rng = np.random.RandomState(3)
    B, H, W = 4, 24, 80
    bgs = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    geom = envmap_ops.envmap_geometry(H, W, 6.0)
    ref = jax.vmap(lambda b: envmap_ops.generate_envmap(b, geom))(bgs)
    out = envmap_ops.generate_envmap_batch(bgs, geom)
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-5
