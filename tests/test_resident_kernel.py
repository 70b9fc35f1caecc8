"""VMEM-resident fused kernel vs the windowed kernel (bit-exactness).

The resident kernel (ops/pallas/fused_kernel.fused_raster_composite_
resident) runs ALL rungs in one pallas_call, accumulating each frame's
padded plane stack in a VMEM scratch bank instead of RMW-ing HBM
windows per drop. Same contribution math, same rung-major/slot-minor
order -> the planes must match the windowed kernel to within FMA
contraction: the alpha/log planes (no multiply in the accumulate) are
asserted BIT-EXACT; the additive planes (w + g*add -> fusable to one
FMA, a choice the two XLA programs are free to make differently) to
one ulp (measured max 4.5e-8 on the bisect scene).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from raintpu.data.textures import procedural_streak_database, texture_bank
from raintpu.ops.rasterize import BucketSpec, RasterConfig
from raintpu.physics.simulator import SimConfig, simulate_frames
from raintpu.render.camera import CameraSettings, RenderSettings
from raintpu.render.frame import PipelineConfig


def _scene(W=96, H=48, cap=32, B=3, fall=200.0):
    db = procedural_streak_database()
    bank = texture_bank(db)
    sim = SimConfig(image_wh=(W, H), focal_px=(300.0, 300.0),
                    exposure_s=2e-3, capacity=cap, z_max=5.0)
    drops = simulate_frames(jax.random.PRNGKey(4), sim,
                            jnp.full(B, fall), jnp.full(B, 5.0),
                            jnp.full(B, 2e-3), jnp.ones(B))
    rng = np.random.RandomState(1)
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W) * 40 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    return db, bank, drops, bg, depth, keys


def _planes(cfg, db, bank, drops, bg, depth, keys):
    from raintpu.render.frame import fused_field_planes

    f = jax.jit(lambda *a: fused_field_planes(
        *a, cfg, interpret=True)[2])
    return np.asarray(f(bg, depth, drops, bank,
                        jnp.asarray(db.bin_edges), keys))


def _assert_matches(res, win):
    """Alpha/log planes bit-exact; additive (and saturation) planes to
    one f32 ulp (FMA contraction freedom in `w + g*add`)."""
    np.testing.assert_array_equal(res[:, :2], win[:, :2])
    np.testing.assert_allclose(res[:, 2:], win[:, 2:],
                               rtol=0, atol=1e-6)


def test_resident_bitexact_vs_windowed():
    """Production-style ladder: strip rungs (one pair-capable), a
    full-width rung, pair+row-strip+narrow on. The resident planes must
    equal the windowed planes bit for bit."""
    W, H, cap, B = 96, 48, 32, 3
    db, bank, drops, bg, depth, keys = _scene(W, H, cap, B)
    raster = RasterConfig(buckets=(
        BucketSpec(24, 24, 4, cap),     # strip + pair-capable
        BucketSpec(32, 24, 4, 8),       # strip
        BucketSpec(64, 48, 8, 8),       # full-width
    ))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    base = PipelineConfig(settings=settings, image_hw=(H, W),
                          fallrate=200.0, raster=raster,
                          env_downsample=8)

    res = _planes(dataclasses.replace(base, resident=True),
                  db, bank, drops, bg, depth, keys)
    win = _planes(dataclasses.replace(base, resident=False),
                  db, bank, drops, bg, depth, keys)
    assert res.shape == win.shape
    assert float(np.abs(win).sum()) > 1.0, "scene must render rain"
    _assert_matches(res, win)


def test_resident_bitexact_modes_off_and_saturation():
    """Modes off (plain strip), 8-plane saturation, and a partial-valid
    frame mix — still bit-exact."""
    W, H, cap, B = 96, 48, 16, 2
    db, bank, drops, bg, depth, keys = _scene(W, H, cap, B, fall=150.0)
    raster = RasterConfig(buckets=(BucketSpec(32, 24, 4, cap),
                                   BucketSpec(64, 48, 8, 8)))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    base = PipelineConfig(settings=settings, image_hw=(H, W),
                          fallrate=150.0, raster=raster,
                          env_downsample=8,
                          pair_eval=False, row_strip=False,
                          compute_saturation_mask=True)
    res = _planes(dataclasses.replace(base, resident=True),
                  db, bank, drops, bg, depth, keys)
    win = _planes(dataclasses.replace(base, resident=False),
                  db, bank, drops, bg, depth, keys)
    assert res.shape[1] == 8
    assert float(np.abs(win).sum()) > 1.0
    _assert_matches(res, win)


def test_resident_multitile_rung():
    """A rung whose window plans multiple row tiles (big defocused
    drops) takes the resident full-window loop — must match the
    windowed multi-tile kernel bit for bit."""
    W, H, cap, B = 320, 280, 8, 2
    db, bank, drops, bg, depth, keys = _scene(W, H, cap, B, fall=30.0)
    from raintpu.ops.pallas.fused_kernel import plan_window
    assert plan_window(240, 200)[3] > 1, "rung must plan multi-tile"
    raster = RasterConfig(buckets=(BucketSpec(32, 24, 4, cap),
                                   BucketSpec(240, 200, 20, 4)))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    base = PipelineConfig(settings=settings, image_hw=(H, W),
                          fallrate=30.0, raster=raster,
                          env_downsample=8)
    res = _planes(dataclasses.replace(base, resident=True),
                  db, bank, drops, bg, depth, keys)
    win = _planes(dataclasses.replace(base, resident=False),
                  db, bank, drops, bg, depth, keys)
    _assert_matches(res, win)


def test_resident_depth_gating():
    """resident_depth: 2 when two banks fit the VMEM budget, 1 when
    only one does, 0 when the stack alone exceeds it (large frames
    fall back to the windowed kernel)."""
    from raintpu.ops.pallas.fused_kernel import (RESIDENT_EVAL_RESERVE,
                                                 RESIDENT_VMEM_BUDGET,
                                                 resident_depth)

    assert resident_depth(5, 488, 1408) in (1, 2)   # KITTI stack
    # A stack sized to just fit once but not twice.
    one = (RESIDENT_VMEM_BUDGET - RESIDENT_EVAL_RESERVE) // 4
    hp = 8
    wp = one // (5 * hp) // 128 * 128
    assert resident_depth(5, hp, wp) == 1
    # Cityscapes-scale planes exceed the budget entirely.
    if RESIDENT_VMEM_BUDGET < 5 * 1144 * 2304 * 4:
        assert resident_depth(5, 1144, 2304) == 0


def test_resident_respects_bf16_fallback():
    """fields_dtype=bfloat16 must take the windowed kernel (the
    resident stack is f32-only); the call must still render."""
    W, H, cap, B = 96, 48, 16, 2
    db, bank, drops, bg, depth, keys = _scene(W, H, cap, B, fall=150.0)
    raster = RasterConfig(buckets=(BucketSpec(32, 24, 4, cap),))
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    cfg = PipelineConfig(settings=settings, image_hw=(H, W),
                         fallrate=150.0, raster=raster,
                         env_downsample=8, resident=True,
                         fields_dtype="bfloat16")
    planes = _planes(cfg, db, bank, drops, bg, depth, keys)
    # The windowed kernel accumulates in the requested bf16 planes;
    # the resident kernel would have returned f32.
    assert planes.dtype == jnp.bfloat16
    assert np.abs(np.asarray(planes, np.float32)).sum() > 0.0
