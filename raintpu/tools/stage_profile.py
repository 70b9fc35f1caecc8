"""Per-stage step anatomy for the headline render (honest device timing).

Times a chain of nested jitted programs over the SAME workload and
reports the stage deltas:

    fog         fog only (attenuation + airlight + blur)
    fog+envmap  + pooled photometry-res envmap
    bg          frame_background (== fog+envmap w/o save outputs)
    prep_photo  bg + cone photometry (env features + drop colors)
    prep_geom   + texture pick + drop geometry
    prep        bg + full drop_fused_params (adds DCT coefs + routing)
    fields      prep + the fused Pallas kernels (field planes done)
    full        fields + finalize (blend, contrast adjust, crop)

Every program fully reduces every output it claims to time (XLA DCE
silently slices away unread results — see BASELINE.md round-3 note),
loops ITERS times on device and fetches ONE scalar (plain
block_until_ready returns early under the axon remote platform).

Usage:  python -m raintpu.tools.stage_profile [--batch 48] [--json]

The kernel-side occupancy anatomy (per-valid-drop / per-gated-step cost
by rung) is the other half of the picture: time `fields` at varying
bucket capacities if that's the question; this tool answers "which
pipeline stage owns the step".
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _tree_sum(x):
    import jax
    import jax.numpy as jnp
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    acc = 0.0
    for l in leaves:
        if jnp.issubdtype(l.dtype, jnp.floating):
            acc = acc + jnp.sum(l.astype(jnp.float32))
        else:
            acc = acc + jnp.sum(l).astype(jnp.float32)
    return acc


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--fallrate", type=float, default=10.0)
    ap.add_argument("--capacity", type=int, default=320)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--hw", type=int, nargs=2, default=(375, 1242),
                    metavar=("H", "W"))
    ap.add_argument("--nuscenes", action="store_true",
                    help="Profile the nuScenes 6-cam rig config instead "
                         "(6x1600x900 @100 mm/hr, full population, "
                         "workload-fitted ladder — bench_suite config 4)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    if args.nuscenes:
        args.hw = (900, 1600)
        args.batch = 6
        args.fallrate = 100.0

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    from raintpu.data.textures import (procedural_streak_database,
                                       texture_bank)
    from raintpu.ops.rasterize import BucketSpec, RasterConfig
    from raintpu.particles.schema import compact_drop_batch
    from raintpu.physics.simulator import SimConfig, simulate_frames
    from raintpu.render.camera import CameraSettings, RenderSettings
    from raintpu.render import frame as frame_mod
    from raintpu.render.frame import (PipelineConfig, drop_fused_params,
                                      env_downsamples, frame_background,
                                      fused_field_planes, render_frames)

    H, W = args.hw
    B = args.batch
    if args.nuscenes:
        settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                        ccd_wh=(W, H)))
    else:
        settings = RenderSettings(camera=CameraSettings())

    if args.nuscenes:
        # Full population, capacity sized like bench_suite config 4.
        from raintpu.physics.simulator import expected_drop_count
        probe = SimConfig.from_settings(settings, capacity=1)
        expect = expected_drop_count(probe, args.fallrate)
        args.capacity = int(
            -(-(expect + 5 * np.sqrt(expect)) // 256) * 256)
    sim_cfg = SimConfig.from_settings(settings, capacity=args.capacity)
    drops = simulate_frames(
        jax.random.PRNGKey(0), sim_cfg,
        jnp.full(B, args.fallrate), jnp.full(B, 8.0),
        jnp.full(B, settings.camera.exposure_s), jnp.ones(B))
    if args.nuscenes:
        counts = np.asarray(drops.count())
        render_cap = int(-(-int(counts.max()) // 128) * 128)
    else:
        render_cap = args.capacity
    drops = jax.jit(jax.vmap(
        lambda d: compact_drop_batch(d, render_cap)))(drops)
    jax.block_until_ready(drops.ip1)

    if args.nuscenes:
        # Workload-fitted ladder from this config's own population
        # (same as bench_suite's nuScenes config).
        from raintpu.data.textures import (
            procedural_streak_database as _psd, texture_bank as _tb)
        from raintpu.ops.rasterize import fit_raster_config
        raster = fit_raster_config(drops, _tb(_psd()).raw.shape[1:],
                                   (W, H), settings)
    else:
        # Same hand ladder as bench.py (headline config).
        raster = RasterConfig(buckets=(
            BucketSpec(24, 32, 5, 224, 12, 6, 3),
            BucketSpec(48, 32, 8, 64, 12, 6, 3),
            BucketSpec(96, 64, 12, 32, 24, 10, 4),
            BucketSpec(112, 96, 20, 16, 16, 8, 4),
        ))
    cfg = PipelineConfig(settings=settings, image_hw=(H, W),
                         fallrate=args.fallrate, raster=raster,
                         fields_dtype=os.environ.get("FIELDS_DTYPE",
                                                     "float32"),
                         row_strip=os.environ.get("ROW_STRIP",
                                                  "1") == "1",
                         cone_downsample=int(os.environ.get("CDS",
                                                            "4")))

    # Same pair/row-strip value gate as production/bench.
    cfg = frame_mod.resolve_kernel_modes(cfg)

    rng = np.random.RandomState(0)
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W) * 60 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    db = procedural_streak_database()
    tex = texture_bank(db)
    edges = jnp.asarray(db.bin_edges)

    from raintpu.ops import envmap as envmap_ops
    from raintpu.ops import fog as fog_ops
    from raintpu.render.frame import _avg_pool_rgb

    cam = settings.camera

    interpret = jax.default_backend() != "tpu"

    def stage_fog(keys, bg, depth, drops, tex, edges):
        # bg sub-stage 1: fog only — the production vmapped form (the
        # batched_fog + Pallas-blur hoist measured NET-slower wired in;
        # see render.frame.fused_field_planes).
        out = jax.vmap(lambda b, d: fog_ops.fog_rain_layer(
            b, d, rain_intensity=cfg.fallrate, f_number=cam.f_number,
            exposure_s=cam.exposure_s, camera_gain=cam.gain))(bg, depth)
        return _tree_sum(out)

    def stage_envmap(keys, bg, depth, drops, tex, edges):
        # bg sub-stage 2: fog + pooled photometry-res envmap — i.e.
        # everything frame_background does; envmap cost = this - fog.
        H_, W_ = cfg.image_hw
        ds = env_downsamples(cfg)[0]
        geom_lo = envmap_ops.envmap_geometry(H_ // ds, W_ // ds,
                                             cam.focal)

        def one(b, d):
            fogged = fog_ops.fog_rain_layer(
                b, d, rain_intensity=cfg.fallrate,
                f_number=cam.f_number, exposure_s=cam.exposure_s,
                camera_gain=cam.gain)
            return envmap_ops.generate_envmap(
                _avg_pool_rgb(fogged, ds), geom_lo), fogged
        return _tree_sum(jax.vmap(one)(bg, depth))

    def stage_bg(keys, bg, depth, drops, tex, edges):
        out = jax.vmap(lambda b, d: frame_background(b, d, cfg))(bg,
                                                                 depth)
        return _tree_sum(out)

    def stage_prep(keys, bg, depth, drops, tex, edges):
        def one(b, d, dr, k):
            fogged, env_photo, env_save = frame_background(b, d, cfg)
            buckets, overflow = drop_fused_params(
                env_photo, dr, tex, edges, k, cfg)
            return _tree_sum((fogged, env_save, buckets, overflow))
        return jnp.sum(jax.vmap(one)(bg, depth, drops, keys))

    from raintpu.ops import photometry as photometry_ops
    from raintpu.ops import rasterize as raster_ops

    def stage_prep_photo(keys, bg, depth, drops, tex, edges):
        # prep sub-stage 1: bg + cone photometry (env features + per-
        # drop colors); photometry cost = this - bg.
        def one(b, d, dr, k):
            fogged, env_photo, env_save = frame_background(b, d, cfg)
            env = photometry_ops.env_features(
                env_photo, downsample=env_downsamples(cfg)[1])
            mid = (dr.wp1 + dr.wp2) / 2.0
            gains = photometry_ops.drop_colors(
                mid, env, sphere_radius=cfg.settings.sphere_radius,
                fov_deg=cfg.settings.drop_fov_deg,
                irrad_type=cfg.settings.irrad_type)
            return _tree_sum((fogged, env_save, gains))
        return jnp.sum(jax.vmap(one)(bg, depth, drops, keys))

    def stage_prep_geom(keys, bg, depth, drops, tex, edges):
        # prep sub-stage 2: + texture pick + drop geometry (window,
        # homography, band); coef prep + routing = prep - this.
        def one(b, d, dr, k):
            fogged, env_photo, env_save = frame_background(b, d, cfg)
            env = photometry_ops.env_features(
                env_photo, downsample=env_downsamples(cfg)[1])
            mid = (dr.wp1 + dr.wp2) / 2.0
            gains = photometry_ops.drop_colors(
                mid, env, sphere_radius=cfg.settings.sphere_radius,
                fov_deg=cfg.settings.drop_fov_deg,
                irrad_type=cfg.settings.irrad_type)
            # Mirror drop_fused_params' noise branch so the geometry
            # sub-stage stays attributable under noisy configs (with
            # zeros here, noise sampling would leak into "coefs+route").
            k_tex, k_noise = jax.random.split(k)
            tex_idx = raster_ops.select_textures(dr, edges, k_tex)
            st = cfg.settings
            if st.noise_scale != 0.0 and st.noise_std != 0.0:
                nkeys = raster_ops.per_drop_keys(
                    k_noise, dr.ip1.shape[0], 0)
                noise_deg = (jax.vmap(
                    lambda kk: jax.random.normal(kk, ()))(nkeys)
                    * st.noise_std * st.noise_scale)
            else:
                noise_deg = jnp.zeros_like(dr.length)
            geom_d = raster_ops.drop_geometry(
                dr, tex.raw.shape[1:], cfg.image_wh,
                focal_m=cam.focal_m, f_number=cam.f_number,
                focus_plane=cfg.settings.focus_plane,
                coc_pixsize=cfg.raster.coc_pixsize,
                apply_defocus=True,
                noise_deg=noise_deg)
            return _tree_sum((fogged, env_save, gains, tex_idx,
                              geom_d))
        return jnp.sum(jax.vmap(one)(bg, depth, drops, keys))

    def stage_fields(keys, bg, depth, drops, tex, edges):
        out = fused_field_planes(bg, depth, drops, tex, edges, keys,
                                 cfg, interpret=interpret)
        return _tree_sum(out)

    def stage_full(keys, bg, depth, drops, tex, edges):
        out = render_frames(bg, depth, drops, tex, edges, keys, cfg)
        return _tree_sum(out)

    stages = [("fog", stage_fog), ("fog+envmap", stage_envmap),
              ("bg", stage_bg), ("prep_photo", stage_prep_photo),
              ("prep_geom", stage_prep_geom), ("prep", stage_prep),
              ("fields", stage_fields), ("full", stage_full)]

    data = (keys, bg, depth, drops, tex, edges)
    results = {}
    for name, fn in stages:
        def many(keys, bg, depth, drops, tex, edges, fn=fn):
            # Every frame input is made loop-variant by adding i*1e-12
            # (rounds away in f32 — value-identical), otherwise XLA's
            # while-loop LICM hoists entire stages out of the timed
            # loop (with static inputs the bg stage times as ~zero)
            # and the numbers measure nothing.
            def body(i, acc):
                k = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
                eps = i.astype(jnp.float32) * 1e-12
                drops_i = jax.tree_util.tree_map(
                    lambda x: x + eps.astype(x.dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    drops)
                return acc + fn(k, bg + eps, depth + eps, drops_i,
                                tex, edges)
            return jax.lax.fori_loop(0, args.iters, body, 0.0)

        mj = jax.jit(many)
        v = float(mj(*data))   # compile + warmup
        assert np.isfinite(v), (name, v)
        dts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(mj(*data))
            dts.append(time.perf_counter() - t0)
        ms = float(np.median(dts)) / args.iters * 1000.0
        results[name] = ms
        if not args.json:
            print(f"{name:8s} {ms:8.2f} ms/step "
                  f"({B / (ms / 1000.0):7.1f} img/s)")

    deltas = {
        "fog": results["fog"],
        "envmap (fog+envmap-fog)": results["fog+envmap"]
                                   - results["fog"],
        "bg": results["bg"],
        "photometry (prep_photo-bg)": results["prep_photo"]
                                      - results["bg"],
        "geometry (prep_geom-photo)": results["prep_geom"]
                                      - results["prep_photo"],
        "coefs+route (prep-geom)": results["prep"]
                                   - results["prep_geom"],
        "prep-bg": results["prep"] - results["bg"],
        "kernel (fields-prep)": results["fields"] - results["prep"],
        "finalize (full-fields)": results["full"] - results["fields"],
    }
    if args.json:
        print(json.dumps({"batch": B, "ms_per_step": results,
                          "deltas_ms": deltas,
                          "backend": jax.default_backend()}))
    else:
        print("--- deltas (ms/step) ---")
        for k, v in deltas.items():
            print(f"{k:24s} {v:8.2f}  ({100 * v / results['full']:.0f}%"
                  " of full)")


if __name__ == "__main__":
    main()
