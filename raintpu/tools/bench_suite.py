"""Extended benchmark suite — the BASELINE.json workload configs.

The headline bench (repo-root bench.py) prints the single driver line;
this suite covers the remaining configs:

    python -m raintpu.tools.bench_suite [config ...]

configs: kitti_sweep, cityscapes_envmap, nuscenes_6cam, online, sharded
(default: all). Each prints one JSON line. All timing is device-side
looped with a single scalar fetch (see bench.py for why).

IMPORTANT (this TPU stack): every step function takes its frame data
as *arguments* — closed-over arrays become HLO constants and the TPU
compiler constant-folds parts of the drop geometry to zero (silent
no-op render). See CLAUDE.md "Environment landmines".
"""

from __future__ import annotations

import json
import os
import sys
import time


def _timed(step, data, iters=6, perturb_ix=(1, 2, 3)):
    """Time `step(i, *data)` device-side. `data` are jit ARGUMENTS
    (never constants — see module docstring).

    Fresh-frame honesty: the float args at ``perturb_ix`` (by default
    bg/depth/drops; keys and the texture bank stay static, mirroring
    the reference's precomputed streak DB) get ``i * 1e-12`` added
    inside the loop — value-identical in f32 but loop-VARIANT, so XLA's
    while-loop LICM cannot hoist fog/envmap/photometry/geometry out of
    the timed loop (the round-3 honesty finding: with static inputs
    those stages run ONCE, not per iteration, and the suite numbers
    were steady-state, not per-frame)."""
    import jax
    import jax.numpy as jnp

    def many(*args):
        def body(i, acc):
            eps = i.astype(jnp.float32) * 1e-12
            p = [jax.tree_util.tree_map(
                     lambda x: x + eps.astype(x.dtype)
                     if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
                 if j in perturb_ix else a
                 for j, a in enumerate(args)]
            return acc + step(i, *p)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    f = jax.jit(many)
    float(f(*data))
    t0 = time.perf_counter()
    v = float(f(*data))
    assert v == v, "NaN in benchmark output"
    return (time.perf_counter() - t0) / iters


def _assert_rain(out):
    """Guard against the silent no-op render (zero rain mass) and
    against bucket-capacity overflow (a fitted ladder that under-sizes
    a rung must fail loudly, not drop drops)."""
    import jax.numpy as jnp

    mass = float(jnp.sum(out.rain_mask))
    assert mass > 1e-2, f"no rain rendered (mask mass {mass})"
    overflow = float(jnp.sum(out.overflow))
    assert overflow == 0, f"{overflow} drops overflowed bucket capacity"
    return mass


def _common(B, W, H, fallrate, capacity=None, settings=None, **cfg_kw):
    """Build a bench scene. ``capacity=None`` sizes the simulation from
    the expected drop population (+5 sigma) and the render capacity
    from the actual max valid count, asserting no truncation — a fixed
    capacity silently truncated heavy intensities in early rounds
    (e.g. 50 mm/hr KITTI expects ~1530 simulated drops)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raintpu.data.textures import procedural_streak_database, texture_bank
    from raintpu.physics.simulator import (SimConfig, expected_drop_count,
                                           simulate_frames)
    from raintpu.render.camera import CameraSettings, RenderSettings
    from raintpu.render.frame import PipelineConfig

    if settings is None:
        settings = RenderSettings(camera=CameraSettings(
            wh=(W, H), ccd_wh=(W, H)))
    # Production cone photometry setting (cds=4: +21% fresh-frame on
    # v5e, end-to-end effect 1.6e-3 — see BASELINE.md round 4).
    # CDS=1 restores the exact cone for A/Bs, as on bench.py.
    cfg_kw.setdefault("cone_downsample", int(os.environ.get("CDS", "4")))
    from raintpu.particles.schema import compact_drop_batch

    if capacity is None:
        probe = SimConfig.from_settings(settings, capacity=1)
        expect = float(expected_drop_count(probe, float(fallrate)))
        sim_cap = int(-(-(expect + 5 * np.sqrt(expect) + 64) // 256)
                      * 256)
    else:
        sim_cap = 2 * capacity
    sim_cfg = SimConfig.from_settings(settings, capacity=sim_cap)
    drops = simulate_frames(jax.random.PRNGKey(0), sim_cfg,
                            jnp.full(B, float(fallrate)), jnp.full(B, 8.0),
                            jnp.full(B, settings.camera.exposure_s),
                            jnp.ones(B))
    counts = np.asarray(drops.count())
    assert counts.max() < sim_cap, \
        f"simulation capacity saturated ({counts.max()}/{sim_cap})"
    if capacity is None:
        capacity = int(-(-int(counts.max()) // 128) * 128)
    else:
        assert counts.max() <= capacity, \
            f"render capacity truncates ({counts.max()}/{capacity})"
    drops = jax.jit(jax.vmap(
        lambda d: compact_drop_batch(d, capacity)))(drops)
    db = procedural_streak_database()
    bank = texture_bank(db)
    # Workload-fitted bucket ladder (round 3): fitted rungs replaced
    # the hand ladders' giant empty rung for a 1.48x headline gain;
    # the same fitter sizes every suite config from its own measured
    # population (overflow counters still guard the fit).
    from raintpu.ops.rasterize import fit_raster_config
    raster = fit_raster_config(drops, bank.raw.shape[1:], (W, H),
                               settings)
    from raintpu.render.frame import resolve_kernel_modes
    cfg = resolve_kernel_modes(PipelineConfig(
        settings=settings, image_hw=(H, W), fallrate=float(fallrate),
        raster=raster, **cfg_kw))
    rng = np.random.RandomState(0)
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W) * 60 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    edges = jnp.asarray(db.bin_edges)
    return cfg, sim_cfg, drops, bg, depth, keys, bank, edges


def bench_kitti_sweep():
    """Intensity sweep {1, 5, 25, 50} mm/hr (BASELINE config 2)."""
    import jax
    import jax.numpy as jnp

    from raintpu.render.frame import render_frames

    # B=12: at 50 mm/hr the auto capacity is ~1024 slots and the
    # remote compile helper dies above roughly B x capacity ~ 2e4
    # (see the nuScenes half-rig note).
    B = 12
    total = 0.0
    for fr in (1, 5, 25, 50):
        # auto capacity: the full population at every intensity
        # (50 mm/hr needs ~1024 slots; 512 used to truncate silently)
        cfg, _, drops, bg, depth, keys, bank, edges = _common(
            B, 1242, 375, fr)

        def step(i, keys, bg, depth, drops, bank, edges, _c=cfg):
            k = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
            out = render_frames(bg, depth, drops, bank, edges, k, _c)
            return (jnp.sum(out.rain_mask[:, ::97, ::97])
                    + jnp.sum(out.rainy_image[:, ::97, ::97]))

        # render_frames is itself jitted (static cfg): direct call
        # passes the data as arguments, never constants.
        _assert_rain(render_frames(bg, depth, drops, bank, edges, keys,
                                   cfg))
        total += _timed(step, (keys, bg, depth, drops, bank, edges))
    rate = 4 * B / total
    return {"metric": "KITTI sweep {1,5,25,50}mm/hr", "value": round(rate, 2),
            "unit": "images/s", "vs_baseline": round(rate / 500.0, 3)}


def bench_cityscapes_envmap():
    """Cityscapes at render_scale=2 with envmap saving (config 3)."""
    import jax
    import jax.numpy as jnp

    from raintpu.render.frame import render_frames

    # Batch 12 wins over 4 with the pipelined kernel (367.9 vs 301.7
    # img/s; the earlier "4 beats 12" lore dated from the no-op-render
    # bench era).
    B = 12
    cfg, _, drops, bg, depth, keys, bank, edges = _common(
        B, 1024, 512, 25, save_envmap=True)

    def step(i, keys, bg, depth, drops, bank, edges):
        k = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
        out = render_frames(bg, depth, drops, bank, edges, k, cfg)
        # envmap summed over ALL pixels: a strided slice lets XLA
        # DCE-slice the whole full-res map away (round-3 finding: the
        # step "cost" of the envmap was 5 ms while the real cost was
        # 37 ms) — the bench must pay for what the pipeline saves.
        return (jnp.sum(out.rain_mask[:, ::97, ::97])
                + jnp.sum(out.rainy_image[:, ::97, ::97])
                + jnp.sum(out.envmap))

    _assert_rain(render_frames(bg, depth, drops, bank, edges, keys, cfg))
    rate = B / _timed(step, (keys, bg, depth, drops, bank, edges))
    return {"metric": "Cityscapes 1024x512 + envmap @25mm/hr",
            "value": round(rate, 2), "unit": "images/s",
            "vs_baseline": round(rate / 500.0, 3)}


def bench_nuscenes_6cam():
    """nuScenes 6-camera rig @100 mm/hr (config 4) — the reference's
    worst case (multi-minute frames, its README.md:261-263).

    Honest workload: the simulation capacity is sized from
    expected_drop_count (+5 sigma Poisson headroom) and the bench
    asserts ZERO truncation and ZERO bucket overflow, so the timed
    render composites the full ~8.5k-drop population per frame
    (round-1 ran this config truncated at ~1.2k — VERDICT item 3).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raintpu.data.textures import (procedural_streak_database,
                                       texture_bank)
    from raintpu.particles.schema import compact_drop_batch
    from raintpu.physics.simulator import (SimConfig,
                                           expected_drop_count,
                                           simulate_frame,
                                           truncated_count)
    from raintpu.render.camera import CameraSettings, RenderSettings
    from raintpu.render.frame import PipelineConfig, render_frames

    # FULL rig (6 cameras) in ONE device step. The round-2 "compile
    # wall" (B=6 x cap 5248 died in the remote compile helper; B=3
    # compiled) was root-caused in round 3: the unchunked photometry
    # cone mask materialized a (B, N_drops, Q_envpx) operand — ~17 GB
    # at the full rig, over HBM — and ops/photometry.py now chunks the
    # drop axis (MAX_MASK_ELEMS), so the full rig fits.
    B, W, H, fallrate = 6, 1600, 900, 100.0
    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    probe = SimConfig.from_settings(settings, capacity=1)
    expect = expected_drop_count(probe, fallrate)
    sim_cap = int(-(-(expect + 5 * np.sqrt(expect)) // 256) * 256)
    sim_cfg = SimConfig.from_settings(settings, capacity=sim_cap)

    keys_sim = jax.random.split(jax.random.PRNGKey(0), B)
    drops = jax.jit(jax.vmap(lambda k: simulate_frame(
        k, sim_cfg, fallrate, 8.0, settings.camera.exposure_s, 1.0)))(
        keys_sim)
    trunc = int(np.asarray(jax.vmap(
        lambda k: truncated_count(k, sim_cfg, fallrate))(keys_sim)).sum())
    assert trunc == 0, f"population truncated by {trunc} drops"

    counts = np.asarray(drops.count())
    render_cap = int(-(-int(counts.max()) // 128) * 128)
    drops = jax.jit(jax.vmap(
        lambda d: compact_drop_batch(d, render_cap)))(drops)

    # Workload-fitted ladder (round 3): rungs + capacities sized from
    # this config's own measured population (overflow assert guards).
    from raintpu.ops.rasterize import fit_raster_config
    db = procedural_streak_database()
    bank = texture_bank(db)
    raster = fit_raster_config(drops, bank.raw.shape[1:], (W, H),
                               settings)
    from raintpu.render.frame import resolve_kernel_modes
    cfg = resolve_kernel_modes(PipelineConfig(
        settings=settings, image_hw=(H, W), fallrate=fallrate,
        raster=raster,
        cone_downsample=int(os.environ.get("CDS", "4"))))
    rng = np.random.RandomState(0)
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W) * 60 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    edges = jnp.asarray(db.bin_edges)

    out = render_frames(bg, depth, drops, bank, edges, keys, cfg)
    overflow = int(np.asarray(jnp.sum(out.overflow)))
    assert overflow == 0, f"{overflow} drops overflowed bucket capacity"
    _assert_rain(out)

    def step(i, keys, bg, depth, drops, bank, edges):
        k = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
        out = render_frames(bg, depth, drops, bank, edges, k, cfg)
        return (jnp.sum(out.rain_mask[:, ::97, ::97])
                + jnp.sum(out.rainy_image[:, ::97, ::97]))

    rate = B / _timed(step, (keys, bg, depth, drops, bank, edges))
    dpf = float(counts.mean())
    return {"metric": f"nuScenes 6x1600x900 rig @100mm/hr, FULL rig in "
                      f"one step (full population ~{dpf:.0f} drops/frame, "
                      f"truncated=0, overflow=0, "
                      f"drops/s={rate * dpf:.0f})",
            "value": round(rate, 2), "unit": "images/s",
            "vs_baseline": round(rate / 500.0, 3)}


def bench_online():
    """Online mode: on-device simulation + render per step (config 5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raintpu.particles.schema import compact_drop_batch
    from raintpu.physics.simulator import simulate_frames
    from raintpu.render.frame import render_frames

    B = 12      # auto capacity at 25 mm/hr is ~640 slots; B=12 stays
    # clear of the remote-compile-helper graph-size wall.
    cfg, sim_cfg, _, bg, depth, keys, bank, edges = _common(
        B, 1242, 375, 25)

    drops0 = simulate_frames(jax.random.PRNGKey(3), sim_cfg,
                             jnp.full(B, 25.0), jnp.full(B, 8.0),
                             jnp.full(B, 2e-3), jnp.ones(B))
    # In-loop compaction to the valid population (the OnlineRenderJob
    # production path does the same): the sim axis holds the pre-cull
    # population, prep scales with capacity — +17% measured (round 3).
    cap = min(int(-(-(int(np.asarray(drops0.count()).max() * 1.3) + 64)
                    // 128) * 128), sim_cfg.capacity)

    def step(i, keys, bg, depth, bank, edges):
        k0 = jax.random.fold_in(jax.random.PRNGKey(3), i)
        drops = simulate_frames(k0, sim_cfg, jnp.full(B, 25.0),
                                jnp.full(B, 8.0), jnp.full(B, 2e-3),
                                jnp.ones(B))
        drops = jax.vmap(lambda d: compact_drop_batch(d, cap))(drops)
        k = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
        out = render_frames(bg, depth, drops, bank, edges, k, cfg)
        return (jnp.sum(out.rain_mask[:, ::97, ::97])
                + jnp.sum(out.rainy_image[:, ::97, ::97]))
    _assert_rain(render_frames(bg, depth, drops0, bank, edges, keys, cfg))
    # drops are simulated in-loop (keyed by i) — only bg/depth need the
    # honesty perturbation here.
    rate = B / _timed(step, (keys, bg, depth, bank, edges),
                      perturb_ix=(1, 2))
    return {"metric": "online sim+render KITTI @25mm/hr",
            "value": round(rate, 2), "unit": "images/s",
            "vs_baseline": round(rate / 500.0, 3)}


def bench_sharded():
    """The sharded (dp x sp) step on the available device(s): the same
    fused Pallas composite under jax.shard_map (VERDICT round-1 item 2
    — the multi-chip path must run at fused-kernel speed, not the XLA
    scatter composite). On one chip this measures the shard_map-wrapped
    fused path; on a pod slice the same code scales dp x sp.
    """
    import jax
    import jax.numpy as jnp

    from raintpu.parallel.mesh import make_mesh, render_frames_sharded

    n = len(jax.devices())
    # B matches the unsharded headline so the two are comparable: the
    # round-4 "sharded -16%" was entirely this config's old B=32 vs
    # the headline's B=48 (same-batch A/B measured 0.2% — noise;
    # BASELINE.md round-5 part 2).
    B = 48
    cfg, _, drops, bg, depth, keys, bank, edges = _common(
        B, 1242, 375, 10, 320, composite_mode="fused")
    mesh = make_mesh(n_devices=n, sp=1)

    def step(i, keys, bg, depth, drops, bank, edges):
        k = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
        out = render_frames_sharded(mesh, bg, depth, drops, bank,
                                    edges, k, cfg)
        return (jnp.sum(out.rain_mask[:, ::97, ::97])
                + jnp.sum(out.rainy_image[:, ::97, ::97]))

    _assert_rain(render_frames_sharded(mesh, bg, depth, drops, bank,
                                       edges, keys, cfg))
    rate = B / _timed(step, (keys, bg, depth, drops, bank, edges))
    return {"metric": f"sharded dp={n} x sp=1 KITTI @10mm/hr (fused "
                      "kernel under shard_map)",
            "value": round(rate, 2), "unit": "images/s",
            "vs_baseline": round(rate / 500.0, 3)}


CONFIGS = {
    "kitti_sweep": bench_kitti_sweep,
    "cityscapes_envmap": bench_cityscapes_envmap,
    "nuscenes_6cam": bench_nuscenes_6cam,
    "online": bench_online,
    "sharded": bench_sharded,
}


def main(argv=None):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    # Official numbers re-check the kernel-mode gate on the real chip
    # (once per process) instead of reusing a persisted verdict.
    os.environ.setdefault("RAINTPU_GATE_FRESH", "1")
    names = (argv or sys.argv[1:]) or list(CONFIGS)
    for name in names:
        try:
            print(json.dumps(CONFIGS[name]()), flush=True)
        except Exception as e:  # keep the suite going
            print(json.dumps({"metric": name, "error": str(e)[:200]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
