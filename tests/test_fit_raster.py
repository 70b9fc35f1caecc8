"""Workload-fitted bucket ladders (ops.rasterize.fit_raster_config).

The fitter replaced the hand ladders' giant "just in case" rung after
the round-3 distribution probe showed it empty at every benched
intensity (ladder sweep: 1094.8 -> 1617.4 img/s at the headline). The
properties that made that safe are pinned here: full coverage of the
sampled population (no clipped stragglers), zero capacity overflow on
the sample, cost-free width snapping, and single-tile window plans.
"""

import numpy as np
import jax
import jax.numpy as jnp

from raintpu.data.textures import procedural_streak_database, texture_bank
from raintpu.ops.rasterize import (RasterConfig, drop_geometry,
                                   fit_raster_config)
from raintpu.ops.pallas.fused_kernel import MAX_SLAB_AREA, plan_window
from raintpu.physics.simulator import SimConfig, simulate_frames
from raintpu.render.camera import CameraSettings, RenderSettings
from raintpu.render.frame import PipelineConfig, render_frames


W, H, B, CAP = 310, 94, 4, 256


def _sample(fallrate=50.0):
    settings = RenderSettings(camera=CameraSettings(
        wh=(W, H), ccd_wh=(W, H)))
    sim = SimConfig.from_settings(settings, capacity=CAP)
    drops = simulate_frames(
        jax.random.PRNGKey(0), sim, jnp.full(B, fallrate),
        jnp.full(B, 8.0), jnp.full(B, settings.camera.exposure_s),
        jnp.ones(B))
    return settings, drops


def _needs(drops, settings, tex_hw):
    cam = settings.camera

    def one(d):
        g = drop_geometry(d, tex_hw, (W, H), focal_m=cam.focal_m,
                          f_number=cam.f_number,
                          focus_plane=settings.focus_plane,
                          coc_pixsize=4.65e-6, apply_defocus=True)
        spill = jnp.floor(4.0 * g.sigma + 0.5)
        return (g.content_wh[:, 0] + 2 * spill,
                g.content_wh[:, 1] + 2 * spill, 4.0 * g.sigma, d.valid)

    nw, nh, s4, v = (np.asarray(x) for x in jax.vmap(one)(drops))
    return nw, nh, s4, v.astype(bool)


def test_fitted_ladder_covers_sample():
    settings, drops = _sample()
    bank = texture_bank(procedural_streak_database())
    tex_hw = bank.raw.shape[1:]
    cfg = fit_raster_config(drops, tex_hw, (W, H), settings)

    nw, nh, s4, v = _needs(drops, settings, tex_hw)
    last = cfg.buckets[-1]
    # tail_margin makes the last rung cover the sampled max strictly
    assert nw[v].max() <= last.pw and nh[v].max() <= last.ph
    assert s4[v].max() <= last.radius

    # rungs are sorted and deduplicated (first-fit never shadows)
    for a, b in zip(cfg.buckets, cfg.buckets[1:]):
        assert (a.ph, a.pw, a.radius) != (b.ph, b.pw, b.radius)
        assert a.ph <= b.ph and a.radius <= b.radius

    # capacities cover per-frame occupancy with headroom
    bid = np.full(nw.shape, len(cfg.buckets) - 1, np.int32)
    for bi in range(len(cfg.buckets) - 2, -1, -1):
        bk = cfg.buckets[bi]
        fit = (nw <= bk.pw) & (nh <= bk.ph) & (s4 <= bk.radius)
        bid = np.where(fit, bi, bid)
    for bi, bk in enumerate(cfg.buckets):
        occ = ((bid == bi) & v).sum(axis=1).max()
        assert occ <= bk.capacity


def test_fitted_rungs_plan_single_tile_and_strip_snap():
    settings, drops = _sample()
    bank = texture_bank(procedural_streak_database())
    cfg = fit_raster_config(drops, bank.raw.shape[1:], (W, H), settings)
    for bk in cfg.buckets:
        ph2, pw2, tile_h, n_tiles = plan_window(bk.ph, bk.pw)
        assert ph2 * pw2 <= MAX_SLAB_AREA or n_tiles == 1
        # widths sit exactly on a cost-free edge: the pair bound
        # (pw + 2*pad == 64 — two drops per eval), the strip bound
        # (pw + 2*pad == 128) or a lane-tile multiple
        pad = int(1.25 * bk.radius) + 2
        assert (bk.pw + 2 * pad == 64 or bk.pw + 2 * pad == 128
                or bk.pw % 128 == 0)


def test_fitted_render_matches_default_ladder():
    settings, drops = _sample()
    db = procedural_streak_database()
    bank = texture_bank(db)
    fitted = fit_raster_config(drops, bank.raw.shape[1:], (W, H),
                               settings)
    rng = np.random.RandomState(0)
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W) * 40 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    edges = jnp.asarray(db.bin_edges)

    outs = {}
    for name, raster in (("fitted", fitted),
                         ("default", RasterConfig.default(CAP))):
        cfg = PipelineConfig(settings=settings, image_hw=(H, W),
                             fallrate=50.0, raster=raster)
        out = render_frames(bg, depth, drops, bank, edges, keys, cfg)
        assert float(jnp.sum(out.overflow)) == 0
        outs[name] = out

    m_fit = np.asarray(outs["fitted"].rain_mask)
    m_def = np.asarray(outs["default"].rain_mask)
    assert m_fit.sum() > 1.0
    # Same drops, same geometry — only mode truncation differs per
    # rung, so the masks must agree almost exactly.
    inter = np.logical_and(m_fit > 0.03, m_def > 0.03).sum()
    union = np.logical_or(m_fit > 0.03, m_def > 0.03).sum()
    assert inter / max(union, 1) > 0.95, inter / max(union, 1)
    img_diff = np.abs(np.asarray(outs["fitted"].rainy_image)
                      - np.asarray(outs["default"].rainy_image)).mean()
    assert img_diff < 2e-3, img_diff


def test_fitter_empty_population_falls_back():
    settings, drops = _sample()
    import dataclasses as dc
    drops = dc.replace(drops, valid=jnp.zeros_like(drops.valid))
    bank = texture_bank(procedural_streak_database())
    cfg = fit_raster_config(drops, bank.raw.shape[1:], (W, H), settings)
    assert len(cfg.buckets) >= 1   # default ladder, no crash
