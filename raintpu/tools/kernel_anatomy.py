"""Per-rung kernel cost anatomy (us/valid-drop, us/gated-step).

Occupancy sweep of the fused Pallas kernel at the PRODUCTION config
(pair + row-strip ON), honest device-loop timing with per-iter
perturbation of the params (defeats XLA while-loop LICM). Derives:
  v = us per valid drop   (slope of time vs n_valid at fixed capacity)
  g = us per gated step   (slope of time vs capacity at n_valid fixed)

Round-5 result (BASELINE.md "Round-5 kernel anatomy"): fitting
v = c0 + a*rows*lanes across the rungs gives v = 0.80us + 1.39e-4*
rows*lanes — a per-drop CONSTANT is ~90% of the hot rung's cost, i.e.
the kernel is per-drop-step-overhead-bound, not series-eval-bound.

Usage:  python -m raintpu.tools.kernel_anatomy   (env: FR=<mm/hr>)
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
NARROW = os.environ.get("NARROW", "1") == "1"

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

# One prep pass -> real bucket params.
def prep(b, d, dr, k):
    fogged, env_photo, _ = frame_background(b, d, cfg)
    buckets, overflow = drop_fused_params(env_photo, dr, tex, edges, k,
                                          cfg)
    return buckets

buckets = jax.jit(jax.vmap(prep))(bg, depth, drops, keys)
buckets = jax.device_get(buckets)
tex_hw = tuple(tex.raw.shape[1:])

sub = SUBLANE
bspecs = cfg.raster.buckets
plans = [plan_window(b.ph, b.pw, sub) for b in bspecs]
hp = (H // sub) * sub + max(p[0] for p in plans)
wp = (W // LANE) * LANE + max(p[1] for p in plans)

print(f"# batch {B}, {FALLRATE} mm/hr; per-rung n_valid mean: "
      + str([float(np.mean(np.sum(bk["valid"], axis=1)))
             for bk in buckets]), flush=True)
print(f"# narrow={NARROW}; per-rung narrow fraction (valid drops): "
      + str([round(float((np.sum((bk['wide'] == 0) & bk['valid'])
                          + 1e-9) / (np.sum(bk['valid']) + 1e-9)), 3)
             for bk in buckets]), flush=True)


def time_bucket(bi, cap, nval):
    """ms per step for rung bi padded to capacity cap with nval valid."""
    bk = buckets[bi]
    bspec = bspecs[bi]
    plan = plans[bi]
    c0 = bk["params"].shape[-1]
    def padc(a, axis):
        if cap == c0:
            return jnp.asarray(a)
        pads = [(0, 0)] * a.ndim
        pads[axis] = (0, cap - c0)
        return jnp.asarray(np.pad(a, pads))
    params = padc(bk["params"], 2)
    anchor = padc(bk["anchor"], 1)
    ayc = padc(bk["ayc"], 1)
    bxc = padc(bk["bxc"], 1)
    n_valid = jnp.minimum(
        jnp.sum(jnp.asarray(bk["valid"]).astype(jnp.int32), axis=1),
        nval).astype(jnp.int32)
    strip = bucket_strip_pad(bspec.ph, bspec.pw, bspec.radius, sub)
    pair = strip > 0 and bspec.pw + 2 * strip <= LANE // 2
    wide = (padc(bk["wide"], 1) if NARROW and strip > 0 else None)

    def many(params, anchor, ayc, bxc, n_valid, wide):
        def body(i, acc):
            p = params + i.astype(jnp.float32) * 1e-12
            fields = jnp.zeros((B, 5, hp, wp), jnp.float32)
            out = fused_raster_composite(
                p, anchor, ayc, bxc, n_valid, fields,
                window_hw=plan, tex_hw=tex_hw, strip_pad=strip,
                row_strip=True, pair=pair, wide=wide)
            return acc + jnp.sum(out[:, 0, ::131, ::131])
        return lax.fori_loop(0, ITERS, body, 0.0)

    f = jax.jit(many)
    args = (params, anchor, ayc, bxc, n_valid, wide)
    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    mean_valid = float(jnp.mean(jnp.minimum(
        jnp.sum(jnp.asarray(bk["valid"]).astype(jnp.int32), axis=1),
        nval)))
    return ms, mean_valid


for bi, bspec in enumerate(bspecs):
    cap = bspec.capacity
    rows = []
    for nval in (0, cap // 4, cap // 2, cap):
        ms, mv = time_bucket(bi, cap, nval)
        rows.append((nval, mv, ms))
        print(f"rung{bi} ({bspec.ph},{bspec.pw},{bspec.radius}) cap={cap}"
              f" nval<={nval:4d} (mean {mv:6.1f}) {ms:7.3f} ms", flush=True)
    # slope us/valid-drop: between first and last row
    (n0, m0, t0_), (n1, m1, t1_) = rows[0], rows[-1]
    if m1 > m0:
        v = (t1_ - t0_) * 1000.0 / ((m1 - m0) * B)
        print(f"rung{bi}: v = {v:.3f} us/valid-drop", flush=True)
    # gated marginal: double the capacity at nval=0
    ms2, _ = time_bucket(bi, cap * 2, 0)
    g = (ms2 - t0_) * 1000.0 / (cap * B)
    print(f"rung{bi}: g = {g:.4f} us/gated-step (cap {cap}->{cap*2} @0 "
          f"valid: {t0_:.3f}->{ms2:.3f} ms)", flush=True)
