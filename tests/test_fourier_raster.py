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


def test_close_population_fourier_matches_gather():
    """Round-4 regressions, both measured against the real reference
    on the close parity scene before fixing:

    * Big drops clipped by the image border must lose the clipped
      content BEFORE the blur (the reference's warp canvas is the
      image-clipped quad bbox, bad_weather.py:303-313) — the band
      window (_tex_band). Was 1.55x mass on a bottom-clipped drop.
    * Heavily-defocused drops must keep their bump profile instead of
      the mirror-factorization's flat-top (modal blur). Was 1.3x
      support at equal mass at sigma_hat ~ 0.2.

    The gather path warps discretely inside the canvas then blurs —
    it has always modeled both effects — so it is the oracle here.
    """
    W, H, cap = 160, 96, 64
    db = procedural_streak_database()
    bank = texture_bank(db)
    sim = SimConfig(image_wh=(W, H), focal_px=(500.0, 500.0),
                    exposure_s=2e-3, capacity=cap, z_max=2.0)
    drops = simulate_frame(jax.random.PRNGKey(13), sim, 60.0, 6.0,
                           2e-3, 1.0)
    # Full-mode buckets (modal needs the mode budget; radius 24 covers
    # the 4*sigma = 18 px blur of the z=0.27 drop).
    raster = RasterConfig(buckets=(BucketSpec(48, 32, 6, cap),
                                   BucketSpec(128, 96, 24, 24)),
                          supersample=4)
    tex_idx = select_textures(drops, jnp.asarray(db.bin_edges),
                              jax.random.PRNGKey(0))
    geom = drop_geometry(drops, bank.raw.shape[1:], (W, H),
                         focal_m=6e-3, f_number=6.0, focus_plane=6.0,
                         coc_pixsize=4.65e-6, apply_defocus=True)
    bg = rasterize_frame_drops(
        drops, geom, bank.raw, tex_idx, (W, H),
        dataclasses.replace(raster, texture_mode="gather"),
        apply_defocus=True)
    bf = rasterize_frame_drops(
        drops, geom, bank.raw, tex_idx, (W, H), raster,
        apply_defocus=True, fourier=(bank.ay, bank.bx))
    minc = np.asarray(geom.min_c)
    shift = np.asarray(geom.shift)
    checked = 0
    for g_b, f_b in zip(bg, bf):
        g = np.asarray(g_b.patches)
        f = np.asarray(f_b.patches)
        valid = np.asarray(g_b.valid)
        didx = np.asarray(g_b.drop_idx)
        for c in range(g.shape[0]):
            if not valid[c] or g[c].max() == 0:
                continue
            # Skip drops whose patch anchor is clipped by the TOP/LEFT
            # image border: there the gather oracle itself is wrong —
            # it rasterizes only in-patch rows, losing the blur spill
            # FROM off-image content that the reference (and the
            # analytic path) keeps by blurring the full canvas before
            # placement.
            a = minc[didx[c]] - shift[didx[c]]
            if a[0] < 0 or a[1] < 0:
                continue
            checked += 1
            mass_r = f[c].sum() / max(g[c].sum(), 1e-6)
            assert 0.85 < mass_r < 1.15, (c, mass_r)
            sup_r = (f[c] > 0.02).sum() / max((g[c] > 0.02).sum(), 1)
            assert 0.75 < sup_r < 1.25, (c, sup_r)
    assert checked >= 8, checked


def test_modal_blur_off_reproduces_classic_widening():
    """The modal_blur switch must actually control the model: with it
    off, the heavy-defocus population renders measurably wider support
    (the classic factorization flattening) than with it on."""
    W, H, cap = 160, 96, 64
    db = procedural_streak_database()
    bank = texture_bank(db)
    sim = SimConfig(image_wh=(W, H), focal_px=(500.0, 500.0),
                    exposure_s=2e-3, capacity=cap, z_max=2.0)
    drops = simulate_frame(jax.random.PRNGKey(13), sim, 60.0, 6.0,
                           2e-3, 1.0)
    raster = RasterConfig(buckets=(BucketSpec(48, 32, 6, cap),
                                   BucketSpec(128, 96, 24, 24)))
    tex_idx = select_textures(drops, jnp.asarray(db.bin_edges),
                              jax.random.PRNGKey(0))
    geom = drop_geometry(drops, bank.raw.shape[1:], (W, H),
                         focal_m=6e-3, f_number=6.0, focus_plane=6.0,
                         coc_pixsize=4.65e-6, apply_defocus=True)

    def support(cfg):
        out = rasterize_frame_drops(
            drops, geom, bank.raw, tex_idx, (W, H), cfg,
            apply_defocus=True, fourier=(bank.ay, bank.bx))
        return sum(int((np.asarray(b.patches) > 0.02).sum())
                   for b in out)

    s_on = support(raster)
    s_off = support(dataclasses.replace(raster, modal_blur=False))
    assert s_off > 1.08 * s_on, (s_on, s_off)


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
