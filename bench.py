"""Headline benchmark: KITTI 1242x375 rain rendering @ 10 mm/hr.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s", "vs_baseline": N, ...}

``value`` is the HONEST fresh-frame throughput: every float input is
perturbed by i*1e-12 inside the timed device loop (value-identical in
f32, but it defeats XLA's while-loop LICM, which otherwise hoists the
loop-invariant fog / envmap / cone-photometry / drop-geometry stages
out of the loop and times only the key-dependent tail — the round-3
honesty finding, BASELINE.md "Measurement honesty"). The old static-
input methodology is still measured and reported as ``steady_state``
for trend comparison.

Baseline target (BASELINE.md): >= 500 images/sec/chip on TPU v5e with
precomputed particles. Drops are simulated on device once (outside the
timed loop, like the reference's precomputed XML); the per-frame loop
then recomputes every stage the reference recomputes per frame
(/root/reference/common/generator.py:299-469 — fog :386, envmap
:398-410, drops :431-436).

IMPORTANT (this TPU stack): frame data MUST be passed as jit
*arguments*, never closed over. Closed-over arrays become HLO constants
and the TPU compiler constant-folds parts of the drop geometry WRONG
(y-components fold to zero -> the kernel silently renders nothing).
See CLAUDE.md "Environment landmines". The bench asserts nonzero rain
mass so a silent no-op render can never produce a headline number.

The pair/row-strip kernel modes are value-gated on hardware before
timing (render.frame.resolve_kernel_modes: small-scene compiled-vs-
interpret check, falls back to the proven plain-strip kernel on
divergence) and the JSON line records the modes that actually ran plus
whether a fallback fired — two runs can never time different kernels
indistinguishably.

A/B env knobs (replacing the retired _bench_dtype.py):
  BATCH, ITERS, HW ("375x1242"), FALLRATE, CAPACITY — workload shape
  FIELDS_DTYPE (float32|bfloat16), ROW_STRIP=0, PAIR=0, NARROW=0,
  RESIDENT=0 — kernel levers (RESIDENT=0 forces the windowed kernel)
  MODAL=0 — disable the modal-blur prep transform (RasterConfig.modal_blur)
  CDS=1 — cone_downsample for the per-drop cone photometry (default 4,
          the production setting: measured +21% honest throughput on
          v5e with 1.6e-3 end-to-end effect; 1 = exact for A/B)
  FITTED=1 — replace the hand ladder with ops.rasterize.fit_raster_config
  BENCH_BACKEND_RETRY_S — backend poll budget (default 600 s)
"""

import dataclasses
import json
import os
import time

import numpy as np


def _env_flag(name: str, default: str = "1") -> bool:
    return os.environ.get(name, default) == "1"


def main():
    # Survive transient axon tunnel outages: poll backend init in a
    # subprocess (a down tunnel can BLOCK jax.devices() forever, and a
    # failed in-process init is cached by jax) before touching jax here.
    from raintpu.utils.backend import wait_for_backend
    platform = wait_for_backend()
    print(f"# backend: {platform}", flush=True)

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: first-run compiles through the
    # remote TPU compiler are minutes; repeats are instant.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    from raintpu.data.textures import procedural_streak_database, texture_bank
    from raintpu.ops.rasterize import BucketSpec, RasterConfig
    from raintpu.particles.schema import compact_drop_batch
    from raintpu.physics.simulator import SimConfig, simulate_frames
    from raintpu.render.camera import CameraSettings, RenderSettings
    from raintpu.render.frame import (PipelineConfig, mode_gate_report,
                                      render_frames, resolve_kernel_modes)

    H, W = (int(v) for v in os.environ.get("HW", "375x1242").split("x"))
    BATCH = int(os.environ.get("BATCH", "48"))
    # fitted-ladder sweep (img/s): 32->1750, 40->1694, 48->1796
    CAPACITY = int(os.environ.get("CAPACITY", "320"))
    FALLRATE = float(os.environ.get("FALLRATE", "10"))
    iters = int(os.environ.get("ITERS", "10"))

    settings = RenderSettings(camera=CameraSettings())  # KITTI defaults
    # Workload-fitted 4-bucket ladder (round-3 distribution probe: max
    # needed window at 10-50 mm/hr is 105x78 with 4*sigma <= 19.8 —
    # every rung plans single-tile / depth-3 pipelined, the first three
    # strip-mode). Per-rung series truncation (ranks 3/3/4/4, small-rung
    # modes 12x6) is visually identical (mask IoU 0.996, image diff
    # 6e-6). Capacities cover per-frame max occupancy; the overflow
    # assert below fails loudly if a rung is undersized.
    raster = RasterConfig(buckets=(
        BucketSpec(24, 32, 5, 224, 12, 6, 3),
        BucketSpec(48, 32, 8, 64, 12, 6, 3),
        BucketSpec(96, 64, 12, 32, 24, 10, 4),
        BucketSpec(112, 96, 20, 16, 16, 8, 4),
    ), modal_blur=_env_flag("MODAL"))

    want_pair = _env_flag("PAIR")
    want_row_strip = _env_flag("ROW_STRIP")
    want_narrow = _env_flag("NARROW")
    want_resident = _env_flag("RESIDENT")
    cfg = PipelineConfig(settings=settings, image_hw=(H, W),
                         fallrate=FALLRATE, raster=raster,
                         pair_eval=want_pair, row_strip=want_row_strip,
                         narrow_dma=want_narrow,
                         resident=want_resident,
                         fields_dtype=os.environ.get("FIELDS_DTYPE",
                                                     "float32"),
                         cone_downsample=int(os.environ.get("CDS", "4")))
    # Value-gate the kernel modes on hardware (shared gate, once per
    # process); the JSON line below discloses what actually ran. The
    # official bench always re-checks the real chip — it must not
    # reuse a persisted verdict (production CLIs do, saving ~3 min of
    # fixed startup per process).
    os.environ.setdefault("RAINTPU_GATE_FRESH", "1")
    cfg = resolve_kernel_modes(cfg)
    fallback_fired = (
        (cfg.pair_eval, cfg.row_strip, cfg.narrow_dma, cfg.resident)
        != (want_pair, want_row_strip, want_narrow, want_resident))

    # Simulate at full capacity (no population truncation), then pack
    # the valid drops down to the render capacity on device.
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

    # FITTED=1: replace the hand ladder with fit_raster_config's
    # (pair-bound width snapping + occupancy-fitted capacities).
    if _env_flag("FITTED", "0"):
        from raintpu.ops.rasterize import fit_raster_config
        fitted = fit_raster_config(drops, tex.raw.shape[1:], (W, H),
                                   settings)
        cfg = dataclasses.replace(cfg, raster=fitted)
        print("# fitted ladder:", [(b.ph, b.pw, b.radius, b.capacity)
                                   for b in fitted.buckets], flush=True)

    def step(keys, bg, depth, drops, tex, edges):
        out = render_frames(bg, depth, drops, tex, edges, keys, cfg)
        return (jnp.sum(out.rainy_image[:, ::97, ::97])
                + jnp.sum(out.rain_mask[:, ::97, ::97]))

    def make_many(perturb: bool):
        def many(keys, bg, depth, drops, tex, edges):
            # All iterations stay on device; ONE scalar fetch at the
            # end forces completion (plain block_until_ready returns
            # before the device finishes under axon). perturb=True adds
            # i*1e-12 to every float input — value-identical in f32 but
            # loop-VARIANT, so XLA cannot hoist the bg/drop-dependent
            # stages out of the loop: the honest fresh-frame cost.
            def body(i, acc):
                k = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
                if perturb:
                    eps = i.astype(jnp.float32) * 1e-12
                    bg_i = bg + eps
                    depth_i = depth + eps
                    drops_i = jax.tree_util.tree_map(
                        lambda x: x + eps.astype(x.dtype)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x,
                        drops)
                else:
                    bg_i, depth_i, drops_i = bg, depth, drops
                return acc + step(k, bg_i, depth_i, drops_i, tex, edges)
            return jax.lax.fori_loop(0, iters, body, 0.0)
        return jax.jit(many)

    data = (keys, bg, depth, drops, tex, edges)

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

    def timed_imgs_per_sec(many_jit, reps=5):
        # Median of reps timed runs: the remote-tunnel device shows
        # ~5-9% run-to-run variance; the median is the conservative
        # estimate (VERDICT round 2 asked for the less flattering
        # estimator over best-of-N).
        float(many_jit(*data))  # warmup/compile
        dts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = float(many_jit(*data))
            dts.append(time.perf_counter() - t0)
            assert np.isfinite(acc)
        return BATCH * iters / float(np.median(dts))

    honest = timed_imgs_per_sec(make_many(perturb=True))
    steady = timed_imgs_per_sec(make_many(perturb=False))

    print(json.dumps({
        "metric": "KITTI 1242x375 fresh-frame render throughput "
                  f"@{FALLRATE:g}mm/hr (batch={BATCH}, "
                  f"~{drops_per_frame:.0f} drops/frame, "
                  f"drops/s={honest * drops_per_frame:.0f}, "
                  f"mask_mass={mask_mass:.1f}, backend={platform})",
        "value": round(honest, 2),
        "unit": "images/s",
        "vs_baseline": round(honest / 500.0, 3),
        # Methodology + kernel-mode disclosure:
        "steady_state": round(steady, 2),
        "pair_eval": cfg.pair_eval,
        "row_strip": cfg.row_strip,
        "narrow_dma": cfg.narrow_dma,
        "resident": cfg.resident,
        "fields_dtype": cfg.fields_dtype,
        "modal_blur": cfg.raster.modal_blur,
        "cone_downsample": cfg.cone_downsample,
        "fallback_fired": fallback_fired,
        "mode_gate": mode_gate_report(),
        "ladder": [[b.ph, b.pw, b.radius, b.capacity]
                   for b in cfg.raster.buckets],
    }))


if __name__ == "__main__":
    main()
