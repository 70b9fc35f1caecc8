import numpy as np
import jax
import jax.numpy as jnp

from raintpu.data.textures import procedural_streak_database
from raintpu.parallel.mesh import (make_mesh, render_frames_sharded,
                                   split_drops_for_sp)
from raintpu.physics.simulator import SimConfig, simulate_frames
from raintpu.ops.rasterize import BucketSpec, RasterConfig
from raintpu.render.camera import CameraSettings, RenderSettings
from raintpu.render.frame import PipelineConfig, render_frames


def _setup(B=4, H=32, W=64, cap=16):
    settings = RenderSettings(camera=CameraSettings(
        wh=(W, H), ccd_wh=(W, H)))
    sim_cfg = SimConfig(image_wh=(W, H), focal_px=(400.0, 400.0),
                        exposure_s=2e-3, capacity=cap, z_max=4.0)
    drops = simulate_frames(jax.random.PRNGKey(0), sim_cfg,
                            jnp.full(B, 200.0), jnp.full(B, 5.0),
                            jnp.full(B, 2e-3), jnp.ones(B))
    rng = np.random.RandomState(0)
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * 50 + 3)
    keys = jax.random.split(jax.random.PRNGKey(42), B)
    db = procedural_streak_database()
    raster = RasterConfig(buckets=(BucketSpec(16, 16, 2, cap),
                                   BucketSpec(32, 24, 4, 8)),
                          supersample=1)
    cfg = PipelineConfig(settings=settings, image_hw=(H, W), fallrate=200.0,
                         raster=raster, env_downsample=8)
    return bg, depth, drops, db, keys, cfg


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_sharded_matches_single_device():
    bg, depth, drops, db, keys, cfg = _setup()
    ref = render_frames(bg, depth, drops, jnp.asarray(db.textures),
                        jnp.asarray(db.bin_edges), keys, cfg)
    mesh = make_mesh(n_devices=4, sp=1)
    out = render_frames_sharded(mesh, bg, depth, drops,
                                jnp.asarray(db.textures),
                                jnp.asarray(db.bin_edges), keys, cfg)
    np.testing.assert_allclose(np.asarray(out.rainy_image),
                               np.asarray(ref.rainy_image), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.rain_mask),
                               np.asarray(ref.rain_mask), atol=2e-5)


def test_dp_x_sp_mesh_runs_and_mask_matches():
    bg, depth, drops, db, keys, cfg = _setup(B=4)
    mesh = make_mesh(sp=2)  # 4 dp x 2 sp
    drops_p = split_drops_for_sp(drops, 2)
    out = render_frames_sharded(mesh, bg, depth, drops_p,
                                jnp.asarray(db.textures),
                                jnp.asarray(db.bin_edges), keys, cfg)
    r = np.asarray(out.rainy_image)
    assert r.shape == (4, 32, 64, 3)
    assert np.all(np.isfinite(r))
    # Per-drop RNG is keyed by global drop index, so the render is
    # bit-invariant to the sp partitioning.
    mesh1 = make_mesh(n_devices=4, sp=1)
    out1 = render_frames_sharded(mesh1, bg, depth, drops,
                                 jnp.asarray(db.textures),
                                 jnp.asarray(db.bin_edges), keys, cfg)
    np.testing.assert_allclose(np.asarray(out.rain_mask),
                               np.asarray(out1.rain_mask), atol=1e-5)
    np.testing.assert_allclose(r, np.asarray(out1.rainy_image), atol=1e-5)


def _fused_cfg(cfg):
    import dataclasses
    return dataclasses.replace(cfg, composite_mode="fused")


def test_fused_sharded_matches_unsharded_fused():
    from raintpu.data.textures import texture_bank

    bg, depth, drops, db, keys, cfg = _setup()
    cfg = _fused_cfg(cfg)
    bank = texture_bank(db)
    edges = jnp.asarray(db.bin_edges)
    ref = render_frames(bg, depth, drops, bank, edges, keys, cfg)
    mesh = make_mesh(n_devices=4, sp=1)
    out = render_frames_sharded(mesh, bg, depth, drops, bank, edges,
                                keys, cfg)
    np.testing.assert_allclose(np.asarray(out.rainy_image),
                               np.asarray(ref.rainy_image), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.rain_mask),
                               np.asarray(ref.rain_mask), atol=2e-5)


def test_fused_sharded_sp_layout_invariant():
    from raintpu.data.textures import texture_bank

    bg, depth, drops, db, keys, cfg = _setup(B=4)
    cfg = _fused_cfg(cfg)
    bank = texture_bank(db)
    edges = jnp.asarray(db.bin_edges)
    mesh1 = make_mesh(n_devices=4, sp=1)
    out1 = render_frames_sharded(mesh1, bg, depth, drops, bank, edges,
                                 keys, cfg)
    mesh2 = make_mesh(sp=2)  # 4 dp x 2 sp
    out2 = render_frames_sharded(mesh2, bg, depth,
                                 split_drops_for_sp(drops, 2), bank,
                                 edges, keys, cfg)
    assert np.all(np.isfinite(np.asarray(out2.rainy_image)))
    np.testing.assert_allclose(np.asarray(out2.rain_mask),
                               np.asarray(out1.rain_mask), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2.rainy_image),
                               np.asarray(out1.rainy_image), atol=1e-5)
    # Drop-sharding conserves alpha mass (psum of order-independent sum).
    a1 = float(np.asarray(out1.rain_mask).sum())
    a2 = float(np.asarray(out2.rain_mask).sum())
    assert a2 > 0 and abs(a1 - a2) / max(a1, 1e-9) < 1e-5


def test_sharded_saturation_mask_sp_invariant():
    """The saturation planes must survive the sp psum and match the
    unsharded fused path for any drop partitioning."""
    import dataclasses
    from raintpu.data.textures import texture_bank
    from raintpu.render.frame import render_frames as rf

    bg, depth, drops, db, keys, cfg = _setup(B=4)
    cfg = dataclasses.replace(cfg, composite_mode="fused",
                              compute_saturation_mask=True)
    bank = texture_bank(db)
    edges = jnp.asarray(db.bin_edges)
    ref = rf(bg, depth, drops, bank, edges, keys, cfg)
    mesh = make_mesh(sp=2)
    out = render_frames_sharded(mesh, bg, depth,
                                split_drops_for_sp(drops, 2), bank,
                                edges, keys, cfg)
    sat_ref = np.asarray(ref.saturation_mask)
    sat = np.asarray(out.saturation_mask)
    assert sat.shape == sat_ref.shape and sat_ref.sum() > 0
    np.testing.assert_allclose(sat, sat_ref, atol=1e-5)


def test_sp_psum_accumulates_all_drops():
    # Splitting drops across sp must not lose any alpha mass.
    bg, depth, drops, db, keys, cfg = _setup(B=2)
    mesh2 = make_mesh(n_devices=4, sp=2)
    mesh1 = make_mesh(n_devices=2, sp=1)
    out1 = render_frames_sharded(mesh1, bg, depth, drops,
                                 jnp.asarray(db.textures),
                                 jnp.asarray(db.bin_edges), keys, cfg)
    out2 = render_frames_sharded(mesh2, bg, depth, split_drops_for_sp(drops, 2),
                                 jnp.asarray(db.textures),
                                 jnp.asarray(db.bin_edges), keys, cfg)
    a1 = float(np.asarray(out1.rain_mask).sum())
    a2 = float(np.asarray(out2.rain_mask).sum())
    assert a2 > 0
    # Drop-sharding must conserve alpha mass exactly (psum of an
    # order-independent sum).
    assert abs(a1 - a2) / max(a1, 1e-9) < 1e-5
