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


def test_retired_pallas_mode_rejected():
    # The round-1 two-stage "pallas" composite mode was retired in
    # round 3; asking for it must fail loudly, not fall through.
    import pytest

    base = PipelineConfig(
        settings=RenderSettings(camera=CameraSettings(wh=(64, 32),
                                                      ccd_wh=(64, 32))),
        image_hw=(32, 64), fallrate=10.0,
        raster=RasterConfig(buckets=(BucketSpec(32, 24, 4, 8),)),
        composite_mode="pallas")
    with pytest.raises(ValueError, match="retired"):
        base.resolved_composite_mode()


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


def test_fused_bf16_fields_match_f32():
    """fields_dtype='bfloat16' halves the kernel's window RMW bytes;
    the only numerical cost is one bf16 rounding (2^-8 relative) per
    overlapping drop on the accumulated planes. The bf16 render must
    agree with the f32 render to well under the golden-parity
    tolerances (measured on this scene: mask max diff ~7e-4, image max
    diff ~1e-3)."""
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
    # One strip-qualifying rung + one full-width rung so both
    # accumulate paths run under bf16.
    raster = RasterConfig(buckets=(BucketSpec(32, 24, 4, cap),
                                   BucketSpec(64, 48, 8, 8)))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    base = PipelineConfig(settings=settings, image_hw=(H, W),
                          fallrate=150.0, raster=raster, env_downsample=8)
    cfg16 = dataclasses.replace(base, fields_dtype="bfloat16")

    from raintpu.render.frame import _render_frames_fused
    out32 = jax.jit(
        lambda *a: _render_frames_fused(*a, base, interpret=True))(
        bg, depth, drops, bank, jnp.asarray(db.bin_edges), keys)
    out16 = jax.jit(
        lambda *a: _render_frames_fused(*a, cfg16, interpret=True))(
        bg, depth, drops, bank, jnp.asarray(db.bin_edges), keys)

    m32 = np.asarray(out32.rain_mask)
    m16 = np.asarray(out16.rain_mask)
    assert m32.sum() > 1.0, "scene must render actual rain"
    # Outputs are f32 regardless of the accumulation dtype.
    assert m16.dtype == np.float32
    assert np.asarray(out16.rainy_image).dtype == np.float32
    np.testing.assert_allclose(m16, m32, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out16.rainy_image),
                               np.asarray(out32.rainy_image), atol=5e-3)
    b32, b16 = m32 > 0.03, m16 > 0.03
    iou = (b32 & b16).sum() / max((b32 | b16).sum(), 1)
    assert iou > 0.995, f"bf16 mask support diverged (IoU {iou:.4f})"


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


def test_fused_kernel_overlap_chain():
    """Hazard stress for the depth-3 pipelined kernel: many drops with
    IDENTICAL (and near-identical) windows force the maximal fallback
    chain (every read overlaps the previous 2 writes), plus interleaved
    disjoint drops exercising the prefetch path. The accumulated planes
    must equal the plain sum over drops."""
    from raintpu.ops.pallas.fused_kernel import (N_PARAMS, P_ADDB,
                                                 P_ADDG, P_ADDR, P_LO,
                                                 P_UU, P_VU,
                                                 fused_raster_composite,
                                                 plan_window)

    B, C = 2, 12
    TH, TW = 64, 32
    R, MY, MX = 1, 4, 4
    plan = plan_window(40, 32)
    hp, wp = 192, 768

    params = np.zeros((B, N_PARAMS, C), np.float32)
    anchor = np.zeros((B, C, 2), np.int32)
    for b in range(B):
        for c in range(C):
            # slots 0-7: same window (anchor 140,16); 8-11: far away.
            ax = 140 if c < 8 else 300 + 40 * (c - 8)
            ay = 16 if c < 8 else 80
            params[b, 0, c] = 1.0   # identity homography
            params[b, 4, c] = 8.0
            params[b, 8, c] = 1.0
            params[b, 9, c] = ax + (c % 3)      # mincx
            params[b, 10, c] = ay + (c % 2)     # mincy
            params[b, 11, c] = 8.0              # wcx
            params[b, 12, c] = 20.0             # wcy
            # sigma in NORMALIZED texture coords (~1 px of blur on the
            # 32/64-px texture) — keeps the content compact so the
            # same-window/far-window overlap structure is preserved.
            params[b, 13, c] = 0.03
            params[b, 14, c] = 0.015
            params[b, P_LO, c] = 0.4
            params[b, P_ADDR, c] = 0.1 * (c + 1)
            params[b, P_ADDG, c] = 0.05
            params[b, P_ADDB, c] = 0.02
            # Content band (UL, UU, VL, VU) — full texture rect (the
            # canvas-clip rows only tighten for image-clipped Big
            # drops, ops.rasterize._tex_band).
            params[b, P_UU, c] = 1.0
            params[b, P_VU, c] = 1.0
            anchor[b, c, 0] = int(params[b, 9, c])
            anchor[b, c, 1] = int(params[b, 10, c])
    rng = np.random.RandomState(3)
    ayc = (rng.rand(B, C, R, MY) * 0.5).astype(np.float32)
    bxc = (rng.rand(B, C, R, MX) * 0.5).astype(np.float32)
    n_valid = np.array([C, 5], np.int32)    # frame 1: partial count

    fields = jnp.zeros((B, 5, hp, wp), jnp.float32)
    out = fused_raster_composite(
        jnp.asarray(params), jnp.asarray(anchor), jnp.asarray(ayc),
        jnp.asarray(bxc), jnp.asarray(n_valid), fields,
        window_hw=plan, tex_hw=(TH, TW), interpret=True)
    out = np.asarray(out)

    # Independent reference: evaluate each drop's patch in numpy and
    # accumulate into full planes (order-independent sums).
    def erf(x):
        x = np.asarray(x, np.float64)
        return np.tanh(1.1283791671 * x + 0.1009055155 * x ** 3)

    ref = np.zeros_like(out)
    ph2, pw2, tile_h, n_tiles = plan
    assert n_tiles == 1
    for b in range(B):
        for c in range(int(n_valid[b])):
            axg = (anchor[b, c, 0] // 128) * 128
            ayg = (anchor[b, c, 1] // 8) * 8
            jj, ii = np.meshgrid(np.arange(pw2), np.arange(tile_h))
            lx = jj + (axg - params[b, 9, c])
            ly = ii + (ayg - params[b, 10, c])
            M = params[b, :9, c].reshape(3, 3)
            hx = M[0, 0] * lx + M[0, 1] * ly + M[0, 2]
            hy = M[1, 0] * lx + M[1, 1] * ly + M[1, 2]
            hz = M[2, 0] * lx + M[2, 1] * ly + M[2, 2]
            hz = np.where(np.abs(hz) < 1e-9, 1e-9, hz)
            xhat = (hx / hz + 0.5) / TW
            yhat = (hy / hz + 0.5) / TH
            g = np.zeros((tile_h, pw2))
            ty = np.cos(np.pi * yhat)
            tx = np.cos(np.pi * xhat)
            for r in range(R):
                uy = np.full_like(g, ayc[b, c, r, 0])
                cm_prev, cm = np.ones_like(g), ty
                for m in range(1, MY):
                    uy = uy + ayc[b, c, r, m] * cm
                    cm, cm_prev = 2.0 * ty * cm - cm_prev, cm
                vx = np.full_like(g, bxc[b, c, r, 0])
                cm_prev, cm = np.ones_like(g), tx
                for m in range(1, MX):
                    vx = vx + bxc[b, c, r, m] * cm
                    cm, cm_prev = 2.0 * tx * cm - cm_prev, cm
                g = g + uy * vx
            # Texture-rect window, mirroring _patch_eval (params rows
            # 13/14 hold sigma in normalized texture coordinates).
            sq2 = 1.4142135
            sgx = max(params[b, 13, c], 2e-3)
            sgy = max(params[b, 14, c], 2e-3)
            win = (0.5 * (erf(xhat / (sq2 * sgx))
                          - erf((xhat - 1.0) / (sq2 * sgx)))
                   * 0.5 * (erf(yhat / (sq2 * sgy))
                            - erf((yhat - 1.0) / (sq2 * sgy))))
            mx = 0.25 + 4.0 * sgx
            my = 0.25 + 4.0 * sgy
            win = np.where((xhat >= -mx) & (xhat <= 1.0 + mx)
                           & (yhat >= -my) & (yhat <= 1.0 + my), win, 0.0)
            g = np.clip(g, 0.0, 1.0) * win
            g = np.where(g > 2e-4, g, 0.0)
            sl = np.s_[ayg:ayg + tile_h, axg:axg + pw2]
            ref[b, 0][sl] += g
            ref[b, 1][sl] += np.log(np.maximum(
                1.0 - g * params[b, P_LO, c], 1e-6))
            ref[b, 2][sl] += g * params[b, P_ADDR, c]
            ref[b, 3][sl] += g * params[b, P_ADDG, c]
            ref[b, 4][sl] += g * params[b, P_ADDB, c]

    assert np.abs(out[:, 0]).sum() > 1.0, "chain scene rendered nothing"
    np.testing.assert_allclose(out, ref, atol=2e-3)

    # Same scene through strip + row-strip + PAIR mode (two drops per
    # eval in the lane halves): the identical-window chains now stress
    # the stash/roll placement on top of the RMW hazards. Content
    # (wcx=8 at mincx) + tails fit well inside 64 - 2*pad lanes.
    out_pair = np.asarray(fused_raster_composite(
        jnp.asarray(params), jnp.asarray(anchor), jnp.asarray(ayc),
        jnp.asarray(bxc), jnp.asarray(n_valid),
        jnp.zeros((B, 5, hp, wp), jnp.float32),
        window_hw=plan, tex_hw=(TH, TW), strip_pad=8, row_strip=True,
        pair=True, interpret=True))
    np.testing.assert_allclose(out_pair, ref, atol=2e-3)
    np.testing.assert_allclose(out_pair, out, atol=1e-6)

    # NARROW DMA mode (round 5): content-tile anchors + per-drop wide
    # flags, mirroring raster_params_frame's formulas. The same-window
    # chain (slots 0-7) is all-narrow RMW hazards; slot 10 (mincx 380
    # -> cs 372, 372 % 128 + 48 > 128) straddles a lane tile and stays
    # wide — a mixed chain. Placement is position-absolute, so the
    # planes must match the full kernel to fp-reassociation tolerance.
    pad = 8
    span = 32 + 2 * pad
    cs = np.floor(params[:, 9, :]) - pad                    # (B, C)
    ax_n = np.clip(cs, 0, 700).astype(np.int32)
    wide = ((ax_n % 128) + span > 128).astype(np.int32)
    nvalid_mask = np.arange(C)[None, :] < np.asarray(n_valid)[:, None]
    n_nrw = int(((wide == 0) & nvalid_mask).sum())
    n_wd = int(((wide == 1) & nvalid_mask).sum())
    assert n_nrw > 0 and n_wd > 0, (n_nrw, n_wd)  # genuinely mixed
    anchor_n = anchor.copy()
    anchor_n[..., 0] = ax_n
    for pair_mode in (False, True):
        out_nrw = np.asarray(fused_raster_composite(
            jnp.asarray(params), jnp.asarray(anchor_n),
            jnp.asarray(ayc), jnp.asarray(bxc), jnp.asarray(n_valid),
            jnp.zeros((B, 5, hp, wp), jnp.float32),
            window_hw=plan, tex_hw=(TH, TW), strip_pad=pad,
            row_strip=True, pair=pair_mode, interpret=True,
            wide=jnp.asarray(wide)))
        np.testing.assert_allclose(out_nrw, ref, atol=2e-3)
        np.testing.assert_allclose(out_nrw, out, atol=1e-6)
    # All-wide flags under the narrow trace pin the wide-DMA branch.
    out_allw = np.asarray(fused_raster_composite(
        jnp.asarray(params), jnp.asarray(anchor_n), jnp.asarray(ayc),
        jnp.asarray(bxc), jnp.asarray(n_valid),
        jnp.zeros((B, 5, hp, wp), jnp.float32),
        window_hw=plan, tex_hw=(TH, TW), strip_pad=pad,
        row_strip=True, pair=False, interpret=True,
        wide=jnp.ones((B, C), jnp.int32)))
    np.testing.assert_allclose(out_allw, out, atol=1e-6)


def test_fused_multitile_buckets_match_xla():
    """The big-window buckets run the row-tiled kernel (n_tiles > 1:
    320x192 -> 2 tiles, 704x384 -> 5 tiles), pipelined across tiles —
    no small-bucket test reaches that path. Close-range giant drops
    force it; result must match the XLA composite."""
    from raintpu.particles.schema import (cull_to_frame,
                                          finalize_raw_streaks,
                                          pack_drop_batch)

    W, H, B = 384, 96, 2
    rng = np.random.RandomState(5)
    n = 10
    x = rng.uniform(40, W - 40, n)
    y_sim = rng.uniform(10, H - 10, n)
    ln = rng.uniform(60, 220, n)          # long streaks
    w = rng.uniform(30, 90, n)            # very wide -> giant buckets
    z = rng.uniform(0.25, 0.8, n)         # close range
    ip1 = np.stack([x, y_sim + ln], -1)
    ip2 = np.stack([x, y_sim], -1)
    wp1 = np.stack([x / 100, np.ones(n), -z], -1)
    wp2 = np.stack([x / 100, 0.9 * np.ones(n), -z], -1)
    rec = finalize_raw_streaks(ip1, ip2, w, w * 0.9, wp1, wp2, (W, H))
    rec = cull_to_frame(rec, (W, H))
    drops_one = pack_drop_batch(rec, 16)
    drops = jax.tree.map(lambda a: jnp.stack([a] * B), drops_one)

    db = procedural_streak_database()
    bank = texture_bank(db)
    rng2 = np.random.RandomState(0)
    bg = jnp.asarray(rng2.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng2.rand(B, H, W) * 40 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    raster = RasterConfig(buckets=(
        BucketSpec(40, 32, 5, 16),
        BucketSpec(320, 192, 32, 16),      # 2-tile plan
        BucketSpec(704, 384, 48, 8),       # 5-tile plan
    ))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    base = PipelineConfig(settings=settings, image_hw=(H, W),
                          fallrate=10.0, raster=raster, env_downsample=8)

    out_x = render_frames(bg, depth, drops, bank,
                          jnp.asarray(db.bin_edges), keys,
                          dataclasses.replace(base, composite_mode="xla"))
    from raintpu.render.frame import _render_frames_fused
    out_f = jax.jit(
        lambda *a: _render_frames_fused(*a, base, interpret=True))(
        bg, depth, drops, bank, jnp.asarray(db.bin_edges), keys)
    assert float(np.asarray(out_x.rain_mask).sum()) > 10.0, \
        "giant-drop scene must produce substantial mask mass"
    np.testing.assert_allclose(np.asarray(out_f.rain_mask),
                               np.asarray(out_x.rain_mask), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_f.rainy_image),
                               np.asarray(out_x.rainy_image), atol=2e-4)
