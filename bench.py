"""Headline benchmark: KITTI 1242x375 rain rendering @ 10 mm/hr.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s", "vs_baseline": N}

Baseline target (BASELINE.md): >= 500 images/sec/chip on TPU v5e with
precomputed particles. Drops are simulated on device once (outside the
timed loop, like the reference's precomputed XML), then the batched
render step is timed steady-state.

IMPORTANT (this TPU stack): frame data MUST be passed as jit
*arguments*, never closed over. Closed-over arrays become HLO constants
and the TPU compiler constant-folds parts of the drop geometry WRONG
(y-components fold to zero -> the kernel silently renders nothing).
See CLAUDE.md "Environment landmines". The bench asserts nonzero rain
mass so a silent no-op render can never produce a headline number.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: first-run compiles through the
    # remote TPU compiler are minutes; repeats are instant.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    from raintpu.data.textures import procedural_streak_database, texture_bank
    from raintpu.ops.rasterize import BucketSpec, RasterConfig
    from raintpu.physics.simulator import SimConfig, simulate_frames
    from raintpu.render.camera import CameraSettings, RenderSettings
    from raintpu.render.frame import PipelineConfig, render_frames

    H, W = 375, 1242
    BATCH = 48      # fitted-ladder sweep (img/s): 32->1750, 40->1694*, 48->1796
    CAPACITY = 320  # (*40 measured pre-mode-truncation; 64 overflows b1)
    FALLRATE = 10.0

    settings = RenderSettings(camera=CameraSettings())  # KITTI defaults
    # Workload-fitted 4-bucket ladder (round-3 distribution probe: max
    # needed window at 10-50 mm/hr is 105x78 with 4*sigma <= 19.8, so
    # the old giant (320,192,32) bucket was empty dead weight whose
    # multi-tile window cost ~28.7 us/drop; every rung below plans
    # single-tile -> depth-3 pipelined, and the first three are
    # strip-mode). Series truncation per rung (ranks 3/3/4/4, small-
    # rung modes 12x6) is visually identical (mask IoU 0.996 vs the
    # full series, image diff 6e-6) and worth ~8%. Measured trajectory
    # at this config (img/s, batch 32): hand 3-rung ladder 1094.8 ->
    # fitted rungs 1617.4 -> rank/mode truncation 1750.5; batch 48 ->
    # 1796.4. Capacities cover the per-frame max occupancy; the
    # overflow assert below fails loudly if a rung is undersized.
    raster = RasterConfig(buckets=(
        BucketSpec(24, 32, 5, 224, 12, 6, 3),
        BucketSpec(48, 32, 8, 64, 12, 6, 3),
        BucketSpec(96, 64, 12, 32, 24, 10, 4),
        BucketSpec(112, 96, 20, 16, 16, 8, 4),
    ))

    # Kernel-mode value gate: the round-3 pair/row-strip eval modes are
    # interpret-validated, but this bench may be the first time they
    # compile through Mosaic on real hardware — verify values on a
    # small scene (TPU vs interpret, the tpu_selfcheck comparison) and
    # fall back to the proven plain-strip kernel if they diverge, so
    # the headline can never time a wrong render.
    import dataclasses

    from raintpu.tools.tpu_selfcheck import build_scene

    def kernel_modes_ok(pair: bool, row_strip: bool) -> bool:
        scfg, (sbg, sdepth, sdrops, stex, sedges, skeys) = build_scene()
        scfg = dataclasses.replace(scfg, pair_eval=pair,
                                   row_strip=row_strip)
        from functools import partial

        from raintpu.render import frame as frame_mod

        @partial(jax.jit, static_argnames=("interpret",))
        def run(bg, depth, drops, tex, edges, keys, interpret):
            return frame_mod._render_frames_fused(
                bg, depth, drops, tex, edges, keys, scfg,
                interpret=interpret)

        hw = run(sbg, sdepth, sdrops, stex, sedges, skeys,
                 interpret=False)
        it = run(sbg, sdepth, sdrops, stex, sedges, skeys,
                 interpret=True)
        m_hw = float(jnp.sum(hw.rain_mask))
        m_it = float(jnp.sum(it.rain_mask))
        diff = float(jnp.max(jnp.abs(hw.rainy_image - it.rainy_image)))
        return m_hw > 1.0 and m_it > 1.0 and diff < 5e-2

    pair_eval = row_strip = True
    if jax.default_backend() == "tpu":   # interpret path is exact
        try:
            ok = kernel_modes_ok(True, True)
        except Exception:
            ok = False
        if not ok:
            pair_eval = row_strip = False
            assert kernel_modes_ok(False, False), (
                "even the fallback kernel diverges from interpret")

    cfg = PipelineConfig(settings=settings, image_hw=(H, W),
                         fallrate=FALLRATE, raster=raster,
                         pair_eval=pair_eval, row_strip=row_strip)

    # Simulate at full capacity (no population truncation), then pack
    # the valid drops down to the render capacity on device.
    from raintpu.particles.schema import compact_drop_batch

    sim_cfg = SimConfig.from_settings(settings, capacity=512)
    drops = simulate_frames(
        jax.random.PRNGKey(0), sim_cfg,
        jnp.full(BATCH, FALLRATE), jnp.full(BATCH, 8.0),
        jnp.full(BATCH, settings.camera.exposure_s), jnp.ones(BATCH))
    drops = jax.jit(jax.vmap(lambda d: compact_drop_batch(d, CAPACITY)))(
        drops)
    jax.block_until_ready(drops.ip1)
    drops_per_frame = float(np.mean(np.asarray(drops.count())))

    rng = np.random.RandomState(0)
    bg = jnp.asarray(rng.rand(BATCH, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(BATCH, H, W) * 60 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), BATCH)
    db = procedural_streak_database()
    tex = texture_bank(db)
    edges = jnp.asarray(db.bin_edges)

    iters = 10

    def step(keys, bg, depth, drops, tex, edges):
        out = render_frames(bg, depth, drops, tex, edges, keys, cfg)
        return (jnp.sum(out.rainy_image[:, ::97, ::97])
                + jnp.sum(out.rain_mask[:, ::97, ::97]))

    def many(keys, bg, depth, drops, tex, edges):
        # All iterations stay on device; ONE scalar fetch at the end
        # forces completion. (Per-iteration fetches pay a ~50 ms tunnel
        # round trip each under axon, and plain block_until_ready
        # returns before the device finishes.)
        def body(i, acc):
            k = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
            return acc + step(k, bg, depth, drops, tex, edges)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    many_jit = jax.jit(many)
    data = (keys, bg, depth, drops, tex, edges)
    float(many_jit(*data))  # warmup/compile

    # Honesty guards, all with data passed as jit ARGS (see module
    # docstring): the render must produce actual rain and no drop may
    # overflow its bucket.
    @jax.jit
    def guard(keys, bg, depth, drops, tex, edges):
        out = render_frames(bg, depth, drops, tex, edges, keys, cfg)
        return jnp.sum(out.rain_mask), jnp.sum(out.overflow)

    mask_mass, overflow = (float(v) for v in guard(*data))
    assert mask_mass > 1.0, f"no rain rendered (mask mass {mask_mass})"
    assert overflow == 0, f"{overflow} drops overflowed bucket capacity"

    # Median of 5 timed runs (~0.4 s each): the remote-tunnel device
    # shows ~5-9% run-to-run variance; the median is the conservative
    # steady-state estimate (round 2 used best-of-3 — VERDICT asked
    # for the less flattering estimator).
    dts = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc = float(many_jit(*data))
        dts.append(time.perf_counter() - t0)
        assert np.isfinite(acc)

    imgs_per_sec = BATCH * iters / float(np.median(dts))
    print(json.dumps({
        "metric": "KITTI 1242x375 render throughput @10mm/hr "
                  f"(batch={BATCH}, ~{drops_per_frame:.0f} drops/frame, "
                  f"drops/s={imgs_per_sec * drops_per_frame:.0f}, "
                  f"mask_mass={mask_mass:.1f}, "
                  f"backend={jax.default_backend()})",
        "value": round(imgs_per_sec, 2),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_sec / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
