"""Decompose the fused kernel's per-valid-drop cost on hardware.

The round-5 cost model (tools/kernel_anatomy, BASELINE.md) found
v = 0.80us + 1.39e-4 * rows*lanes per valid drop — a per-drop CONSTANT
owns ~90% of the hot rung. This tool prices the constant's components
by trace-time knockout (``ablate`` static arg of
fused_raster_composite): patch eval, placement rotates, accumulate
adds, window write DMA, window read DMA; the final residual is scalar/
step overhead (hazard predicates + DMA issue + grid machinery).

Every non-empty knockout renders garbage BY DESIGN; the tool sums the
output only to force completion (honest device-loop timing with the
standard LICM-defeating perturbation).

Usage:  python -m raintpu.tools.kernel_ablation   (env: FR, RUNGS)
"""
import os, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

from raintpu.data.textures import procedural_streak_database, texture_bank
from raintpu.ops.rasterize import BucketSpec, RasterConfig
from raintpu.particles.schema import compact_drop_batch
from raintpu.physics.simulator import SimConfig, simulate_frames
from raintpu.render.camera import CameraSettings, RenderSettings
from raintpu.render.frame import (PipelineConfig, drop_fused_params,
                                  frame_background)
from raintpu.ops.pallas.fused_kernel import (LANE, SUBLANE,
                                             bucket_strip_pad,
                                             fused_raster_composite,
                                             plan_window)

B = 48
H, W = 375, 1242
FALLRATE = float(os.environ.get("FR", "10"))
ITERS = 30
RUNGS = tuple(int(r) for r in os.environ.get("RUNGS", "0,1").split(","))

settings = RenderSettings(camera=CameraSettings())
raster = RasterConfig(buckets=(
    BucketSpec(24, 32, 5, 224, 12, 6, 3),
    BucketSpec(48, 32, 8, 64, 12, 6, 3),
    BucketSpec(96, 64, 12, 32, 24, 10, 4),
    BucketSpec(112, 96, 20, 16, 16, 8, 4),
))
cfg = PipelineConfig(settings=settings, image_hw=(H, W),
                     fallrate=FALLRATE, raster=raster,
                     cone_downsample=4)

sim_cfg = SimConfig.from_settings(settings, capacity=512)
drops = simulate_frames(jax.random.PRNGKey(0), sim_cfg,
                        jnp.full(B, FALLRATE), jnp.full(B, 8.0),
                        jnp.full(B, settings.camera.exposure_s),
                        jnp.ones(B))
drops = jax.jit(jax.vmap(lambda d: compact_drop_batch(d, 320)))(drops)

rng = np.random.RandomState(0)
bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
depth = jnp.asarray((rng.rand(B, H, W) * 60 + 3).astype(np.float32))
keys = jax.random.split(jax.random.PRNGKey(1), B)
db = procedural_streak_database()
tex = texture_bank(db)
edges = jnp.asarray(db.bin_edges)


def prep(b, d, dr, k):
    fogged, env_photo, _ = frame_background(b, d, cfg)
    buckets, overflow = drop_fused_params(env_photo, dr, tex, edges, k,
                                          cfg)
    return buckets

buckets = jax.device_get(jax.jit(jax.vmap(prep))(bg, depth, drops, keys))
tex_hw = tuple(tex.raw.shape[1:])

sub = SUBLANE
bspecs = cfg.raster.buckets
plans = [plan_window(b.ph, b.pw, sub) for b in bspecs]
hp = (H // sub) * sub + max(p[0] for p in plans)
wp = (W // LANE) * LANE + max(p[1] for p in plans)


def time_variant(bi, nval_cap, pair, ablate, narrow=False,
                 anchors_mode="real", plan_override=None):
    """anchors_mode: "real" = the workload's anchors; "spread" =
    synthetic anchors guaranteeing NO window overlaps between nearby
    steps (pure-prefetch steady state — prices the hazard-fallback
    serialization of the real workload); "chain" = every drop in one
    window (maximal fallback chains). Placement changes make the
    render wrong; the sum only forces completion."""
    bk = buckets[bi]
    bspec = bspecs[bi]
    plan = plan_override or plans[bi]
    params = jnp.asarray(bk["params"])
    anchor = jnp.asarray(bk["anchor"])
    if anchors_mode != "real":
        nslots = anchor.shape[1]
        i = np.arange(nslots)
        if anchors_mode == "spread":
            axs = (128 * (3 * i % 8)).astype(np.int32)     # 0..896
            ays = (8 * ((5 * i) % 40)).astype(np.int32)    # 0..312
        else:   # chain
            axs = np.full(nslots, 256, np.int32)
            ays = np.full(nslots, 64, np.int32)
        a = np.broadcast_to(np.stack([axs, ays], -1)[None],
                            (B, nslots, 2)).copy()
        anchor = jnp.asarray(a)
    ayc = jnp.asarray(bk["ayc"])
    bxc = jnp.asarray(bk["bxc"])
    n_valid = jnp.minimum(
        jnp.sum(jnp.asarray(bk["valid"]).astype(jnp.int32), axis=1),
        nval_cap).astype(jnp.int32)
    strip = bucket_strip_pad(bspec.ph, bspec.pw, bspec.radius, sub)
    pair = pair and strip > 0 and bspec.pw + 2 * strip <= LANE // 2
    wide = jnp.asarray(bk["wide"]) if narrow and strip > 0 else None

    def many(params, anchor, ayc, bxc, n_valid, wide):
        def body(i, acc):
            p = params + i.astype(jnp.float32) * 1e-12
            fields = jnp.zeros((B, 5, hp, wp), jnp.float32)
            out = fused_raster_composite(
                p, anchor, ayc, bxc, n_valid, fields,
                window_hw=plan, tex_hw=tex_hw, strip_pad=strip,
                row_strip=True, pair=pair, ablate=ablate, wide=wide)
            return acc + jnp.sum(out[:, 0, ::131, ::131])
        return lax.fori_loop(0, ITERS, body, 0.0)

    f = jax.jit(many)
    args = (params, anchor, ayc, bxc, n_valid, wide)
    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    mean_valid = float(jnp.mean(n_valid))
    return ms, mean_valid


# Cumulative knockout ladder: each line strips ONE more component; the
# difference to the previous line prices that component.
LADDER = [
    ("narrow single", False, "", True),
    ("narrow + pair (prod)", True, "", True),
    ("pair wide", True, "", False),
    ("single full", False, "", False),
    ("- eval", False, "noeval", False),
    ("- eval - roll", False, "noeval+noroll", False),
    ("- eval - accum", False, "noeval+noaccum", False),
    ("- eval - accum - rdwait", False, "noeval+noaccum+nordwait",
     False),
    ("- eval - accum - write", False, "noeval+noaccum+nowrite",
     False),
    ("- eval - accum - dma", False,
     "noeval+noaccum+nowrite+noread", False),
]

for bi in RUNGS:
    bspec = bspecs[bi]
    cap = bspec.capacity
    print(f"== rung{bi} ({bspec.ph},{bspec.pw},{bspec.radius}) "
          f"cap={cap} window={plans[bi]}", flush=True)
    prev = None
    # LADDER=0 skips the knockout ladder (e.g. to run only the anchor
    # bracket; the nordwait knockout leaves read semaphores unwaited
    # and can wedge the device on long runs).
    ladder = LADDER if os.environ.get("LADDER", "1") == "1" else []
    for label, pair, ablate, narrow in ladder:
        ms0, _ = time_variant(bi, 0, pair, ablate, narrow)
        ms1, mv = time_variant(bi, cap, pair, ablate, narrow)
        v = (ms1 - ms0) * 1000.0 / (mv * B)
        delta = "" if prev is None else f"  (saves {prev - v:+.3f})"
        if not label.startswith("narrow") and label != "pair wide":
            prev = v
        print(f"  {label:<24s} v = {v:6.3f} us/drop "
              f"[{ms0:7.3f} -> {ms1:7.3f} ms, mean_valid {mv:.1f}]"
              f"{delta}", flush=True)
    # Hazard-serialization bracket: same kernel, synthetic anchors.
    for mode in ("spread", "chain"):
        ms0, _ = time_variant(bi, 0, False, "", anchors_mode=mode)
        ms1, mv = time_variant(bi, cap, False, "", anchors_mode=mode)
        v = (ms1 - ms0) * 1000.0 / (mv * B)
        print(f"  anchors={mode:<17s} v = {v:6.3f} us/drop "
              f"[{ms0:7.3f} -> {ms1:7.3f} ms, mean_valid {mv:.1f}]",
              flush=True)
    # DMA-scaling probe (DMAPROBE=1): pure window DMAs (no VPU work),
    # spread anchors (no hazards), window tile_h swept. Segments/DMA =
    # n_planes * tile_h, bytes = segments * pw2 * 4: if time scales
    # with tile_h the DMA engine cost is per ROW SEGMENT (explains the
    # narrow-DMA neutrality — narrow halves segment LENGTH, not
    # count); if flat it is per-descriptor issue/wait.
    if os.environ.get("DMAPROBE", "0") == "1" and bi == RUNGS[0]:
        for th in (8, 16, 32, 64):
            po = (th, plans[bi][1], th, 1)
            ms0, _ = time_variant(bi, 0, False, "noeval+noaccum",
                                  anchors_mode="spread",
                                  plan_override=po)
            ms1, mv = time_variant(bi, cap, False, "noeval+noaccum",
                                   anchors_mode="spread",
                                   plan_override=po)
            v = (ms1 - ms0) * 1000.0 / (mv * B)
            print(f"  dma-only tile_h={th:<3d}     v = {v:6.3f} "
                  f"us/drop [{ms0:7.3f} -> {ms1:7.3f} ms]", flush=True)
