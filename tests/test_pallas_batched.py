"""Batched Pallas composite vs XLA composite on a full render."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from raintpu.data.textures import procedural_streak_database, texture_bank
from raintpu.ops.rasterize import BucketSpec, RasterConfig
from raintpu.physics.simulator import SimConfig, simulate_frames
from raintpu.render.camera import CameraSettings, RenderSettings
from raintpu.render.frame import PipelineConfig, render_frames


def test_render_frames_pallas_matches_xla():
    W, H, cap, B = 96, 48, 32, 3
    db = procedural_streak_database()
    bank = texture_bank(db)
    sim = SimConfig(image_wh=(W, H), focal_px=(300.0, 300.0),
                    exposure_s=2e-3, capacity=cap, z_max=5.0)
    drops = simulate_frames(jax.random.PRNGKey(1), sim,
                            jnp.full(B, 150.0), jnp.full(B, 5.0),
                            jnp.full(B, 2e-3), jnp.ones(B))
    rng = np.random.RandomState(0)
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W) * 40 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    raster = RasterConfig(buckets=(BucketSpec(32, 24, 4, cap),
                                   BucketSpec(64, 48, 8, 8)))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    base = PipelineConfig(settings=settings, image_hw=(H, W),
                          fallrate=150.0, raster=raster, env_downsample=8)

    cfg_x = dataclasses.replace(base, composite_mode="xla")
    out_x = render_frames(bg, depth, drops, bank, jnp.asarray(db.bin_edges),
                          keys, cfg_x)
    # Pallas path in interpret mode runs on CPU; jit of interpret=False
    # pallas on CPU is unsupported, so monkeypatch interpret through.
    import raintpu.ops.pallas.composite_kernel as ck
    orig = ck.composite_drops_pallas_batched

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    ck.composite_drops_pallas_batched = interp
    try:
        cfg_p = dataclasses.replace(base, composite_mode="pallas")
        out_p = render_frames(bg, depth, drops, bank,
                              jnp.asarray(db.bin_edges), keys, cfg_p)
    finally:
        ck.composite_drops_pallas_batched = orig

    np.testing.assert_allclose(np.asarray(out_p.rain_mask),
                               np.asarray(out_x.rain_mask), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.rainy_image),
                               np.asarray(out_x.rainy_image), atol=1e-5)


def test_render_frames_fused_matches_xla():
    W, H, cap, B = 96, 48, 32, 2
    db = procedural_streak_database()
    bank = texture_bank(db)
    sim = SimConfig(image_wh=(W, H), focal_px=(300.0, 300.0),
                    exposure_s=2e-3, capacity=cap, z_max=5.0)
    drops = simulate_frames(jax.random.PRNGKey(4), sim,
                            jnp.full(B, 150.0), jnp.full(B, 5.0),
                            jnp.full(B, 2e-3), jnp.ones(B))
    rng = np.random.RandomState(1)
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W) * 40 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    raster = RasterConfig(buckets=(BucketSpec(32, 24, 4, cap),
                                   BucketSpec(64, 48, 8, 8)))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    base = PipelineConfig(settings=settings, image_hw=(H, W),
                          fallrate=150.0, raster=raster, env_downsample=8)

    cfg_x = dataclasses.replace(base, composite_mode="xla")
    out_x = render_frames(bg, depth, drops, bank, jnp.asarray(db.bin_edges),
                          keys, cfg_x)

    from raintpu.render.frame import _render_frames_fused
    out_f = jax.jit(
        lambda *a: _render_frames_fused(*a, base, interpret=True))(
        bg, depth, drops, bank, jnp.asarray(db.bin_edges), keys)

    mx = np.asarray(out_x.rain_mask)
    mf = np.asarray(out_f.rain_mask)
    assert np.all(np.isfinite(mf))
    # Same formula over slightly different window grids: near-identical.
    np.testing.assert_allclose(mf, mx, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_f.rainy_image),
                               np.asarray(out_x.rainy_image), atol=2e-4)

    # Saturation planes: the fused 8-plane kernel must match the XLA
    # scatter accumulation.
    cfg_s = dataclasses.replace(base, compute_saturation_mask=True)
    cfg_sx = dataclasses.replace(cfg_s, composite_mode="xla")
    out_sx = render_frames(bg, depth, drops, bank,
                           jnp.asarray(db.bin_edges), keys, cfg_sx)
    out_sf = jax.jit(
        lambda *a: _render_frames_fused(*a, cfg_s, interpret=True))(
        bg, depth, drops, bank, jnp.asarray(db.bin_edges), keys)
    sat_x = np.asarray(out_sx.saturation_mask)
    sat_f = np.asarray(out_sf.saturation_mask)
    assert sat_x.shape == (B, H, W, 3)
    assert np.all(np.isfinite(sat_f))
    assert sat_x.sum() > 0, "scene must produce a nonzero sat mask"
    np.testing.assert_allclose(sat_f, sat_x, atol=2e-4)
    # With the flag off, the output field is absent.
    assert out_x.saturation_mask is None


def test_fused_batch_chunking_matches_xla(monkeypatch):
    """Batches above MAX_KERNEL_BATCH are split into multiple kernel
    calls over disjoint plane slices — the result must be identical to
    the unchunked XLA composite. The production threshold is large
    (round 2 showed the old batch-14 fault was a bench artifact), so
    the chunk path is forced here to keep it covered."""
    import raintpu.render.frame as fm

    monkeypatch.setattr(fm, "MAX_KERNEL_BATCH", 12)
    W, H, cap, B = 64, 32, 16, 16  # B > MAX_KERNEL_BATCH -> 2 chunks
    db = procedural_streak_database()
    bank = texture_bank(db)
    sim = SimConfig(image_wh=(W, H), focal_px=(250.0, 250.0),
                    exposure_s=2e-3, capacity=cap, z_max=5.0)
    drops = simulate_frames(jax.random.PRNGKey(7), sim,
                            jnp.full(B, 200.0), jnp.full(B, 5.0),
                            jnp.full(B, 2e-3), jnp.ones(B))
    rng = np.random.RandomState(2)
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W) * 40 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(8), B)
    raster = RasterConfig(buckets=(BucketSpec(24, 24, 3, cap),
                                   BucketSpec(48, 48, 6, 8)))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    base = PipelineConfig(settings=settings, image_hw=(H, W),
                          fallrate=200.0, raster=raster, env_downsample=8)
    out_x = render_frames(bg, depth, drops, bank,
                          jnp.asarray(db.bin_edges), keys,
                          dataclasses.replace(base, composite_mode="xla"))
    from raintpu.render.frame import _render_frames_fused
    out_f = jax.jit(
        lambda *a: _render_frames_fused(*a, base, interpret=True))(
        bg, depth, drops, bank, jnp.asarray(db.bin_edges), keys)
    assert float(np.asarray(out_x.rain_mask).sum()) > 0
    np.testing.assert_allclose(np.asarray(out_f.rain_mask),
                               np.asarray(out_x.rain_mask), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_f.rainy_image),
                               np.asarray(out_x.rainy_image), atol=2e-4)
