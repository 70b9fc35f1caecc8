"""Analytic (DCT) rasterization vs the bilinear-gather golden path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from raintpu.data.textures import (factorize_streak_db,
                                   procedural_streak_database, texture_bank)
from raintpu.ops.rasterize import (BucketSpec, RasterConfig, drop_geometry,
                                   rasterize_frame_drops, select_textures)
from raintpu.physics.simulator import SimConfig, simulate_frame
from raintpu.render.camera import CameraSettings, RenderSettings
from raintpu.render.frame import PipelineConfig, render_frame


def test_dct_reconstruction_quality():
    db = procedural_streak_database()
    ay, bx = factorize_streak_db(db, rank=6, modes_y=32, modes_x=12)
    k, th, tw = db.textures.shape
    yhat = (np.arange(th) + 0.5) / th
    xhat = (np.arange(tw) + 0.5) / tw
    py = np.cos(np.pi * np.outer(yhat, np.arange(32)))
    px = np.cos(np.pi * np.outer(xhat, np.arange(12)))
    rec = np.einsum("ym,krm,xn,krn->kyx", py, ay, px, bx)
    err = np.sqrt(((rec - db.textures) ** 2).mean())
    assert err / db.textures.std() < 0.08, err


def _drops_and_geom(W=128, H=64, cap=64):
    sim = SimConfig(image_wh=(W, H), focal_px=(400.0, 400.0),
                    exposure_s=2e-3, capacity=cap, z_max=6.0)
    drops = simulate_frame(jax.random.PRNGKey(5), sim, 150.0, 8.0,
                           2e-3, 1.0)
    return drops


def _raster_both(apply_defocus):
    W, H, cap = 128, 64, 64
    db = procedural_streak_database()
    bank = texture_bank(db)
    drops = _drops_and_geom(W, H, cap)
    raster = RasterConfig(buckets=(BucketSpec(48, 32, 6, cap),
                                   BucketSpec(96, 64, 12, 16)),
                          supersample=2)
    tex_idx = select_textures(drops, jnp.asarray(db.bin_edges),
                              jax.random.PRNGKey(0))
    geom = drop_geometry(drops, bank.raw.shape[1:], (W, H),
                         focal_m=6e-3, f_number=6.0, focus_plane=6.0,
                         coc_pixsize=4.65e-6, apply_defocus=apply_defocus)
    b_gather = rasterize_frame_drops(
        drops, geom, bank.raw, tex_idx, (W, H),
        dataclasses.replace(raster, texture_mode="gather"),
        apply_defocus=apply_defocus)
    b_fourier = rasterize_frame_drops(
        drops, geom, bank.raw, tex_idx, (W, H), raster,
        apply_defocus=apply_defocus, fourier=(bank.ay, bank.bx))
    return b_gather, b_fourier


def test_fourier_matches_gather_sharp():
    # Note: at heavy downscales the analytic path is the *better*
    # approximation of cv2 INTER_AREA (true box average) while the
    # supersampled gather under-samples narrow streaks — so tolerances
    # here are footprint/energy level, not pixel-exact.
    bg, bf = _raster_both(apply_defocus=False)
    for g_b, f_b in zip(bg, bf):
        g = np.asarray(g_b.patches)
        f = np.asarray(f_b.patches)
        if g.max() == 0:
            continue
        # The gather support must be contained in the fourier support.
        gm, fm = g > 0.05, f > 0.02
        assert (gm & fm).sum() / max(gm.sum(), 1) > 0.9
        # Energy within 50% at bucket level.
        assert abs(f.sum() - g.sum()) / max(g.sum(), 1e-6) < 0.5


def test_fourier_matches_gather_defocused():
    bg, bf = _raster_both(apply_defocus=True)
    tot_g = sum(float(np.asarray(b.patches).sum()) for b in bg)
    tot_f = sum(float(np.asarray(b.patches).sum()) for b in bf)
    assert tot_g > 0
    # Analytic damping conserves blur mass approximately.
    assert abs(tot_f - tot_g) / tot_g < 0.3, (tot_f, tot_g)


def test_full_frame_fourier_vs_gather():
    W, H, cap = 128, 64, 64
    db = procedural_streak_database()
    bank = texture_bank(db)
    drops = _drops_and_geom(W, H, cap)
    rng = np.random.RandomState(0)
    bg = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(H, W) * 50 + 3).astype(np.float32))
    raster = RasterConfig(buckets=(BucketSpec(48, 32, 6, cap),
                                   BucketSpec(96, 64, 12, 16)))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    cfg = PipelineConfig(settings=settings, image_hw=(H, W),
                         fallrate=50.0, raster=raster, env_downsample=8)
    key = jax.random.PRNGKey(3)
    out_f = render_frame(bg, depth, drops, bank, jnp.asarray(db.bin_edges),
                         key, cfg)
    cfg_g = dataclasses.replace(
        cfg, raster=dataclasses.replace(raster, texture_mode="gather"))
    out_g = render_frame(bg, depth, drops, bank.raw,
                         jnp.asarray(db.bin_edges), key, cfg_g)
    rf = np.asarray(out_f.rainy_image)
    rg = np.asarray(out_g.rainy_image)
    assert np.all(np.isfinite(rf))
    # Pixelwise closeness of the full render between both samplers.
    assert np.abs(rf - rg).mean() < 0.01
    mf = np.asarray(out_f.rain_mask) > 0.01
    mg = np.asarray(out_g.rain_mask) > 0.01
    union = (mf | mg).sum()
    assert union == 0 or (mf & mg).sum() / union > 0.6
