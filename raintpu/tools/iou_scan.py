"""Strict-IoU decomposition: registration scan + edge analysis.

Scans a global sub-pixel offset applied to raintpu's analytic content
placement and measures strict rain-mask IoU against the REAL reference
code's mask, to decompose the strict-IoU loss into
(a) systematic registration offset (IoU peak away from (0,0)),
(b) sub-pixel edge rounding (disagreement confined to 1px boundary),
(c) shape/energy mismatch (interior disagreement).
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("MPLBACKEND", "Agg")
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np
import pytest

import test_reference_code_parity as T

# --- scene (same as the test fixture) --------------------------------
H, W = T.H, T.W
rng = np.random.RandomState(2)
yy = np.linspace(0, 1, H)[:, None] * np.ones((1, W))
bg = np.stack([0.35 + 0.3 * yy + rng.rand(H, W) * 0.05,
               0.4 + 0.25 * yy, 0.55 - 0.15 * yy], -1)
bg = np.clip(bg, 0, 1).astype(np.float32)
depth = (5 + 150 * (1 - yy)).astype(np.float32)

from raintpu.physics.simulator import SimConfig, simulate_frame
sim = SimConfig(image_wh=(W, H), focal_px=(500.0, 500.0),
                exposure_s=T.EXPOSURE_S, capacity=64, z_max=7.0)
batch = simulate_frame(jax.random.PRNGKey(11), sim, 100.0, 6.0,
                       T.EXPOSURE_S, 1.0)
v = np.asarray(batch.valid)
rec = {k: np.asarray(getattr(batch, k))[v]
       for k in ("ip1", "ip2", "iw1", "iw2", "wp1", "wp2",
                 "max_width", "length", "ratio", "drop_type")}
n = len(rec["ip1"])
print(f"scene: {n} drops")

# --- reference render (real code) -------------------------------------
from types import SimpleNamespace
import matplotlib
matplotlib.use("Agg")
np.int = int
np.float = float
for p in (T.SHIMS, T.REF_ROOT):
    if p not in sys.path:
        sys.path.insert(0, p)
import common.add_attenuation as add_attenuation
import common.bad_weather as bw
import common.generator as gen
import common.my_utils as my_utils
import common.solid_angle as ref_solid_angle
refns = SimpleNamespace(bw=bw, gen=gen, my_utils=my_utils,
                        solid_angle=ref_solid_angle,
                        add_attenuation=add_attenuation)

from raintpu.data.textures import procedural_streak_database, texture_bank
db = procedural_streak_database()
tex_choice = (np.arange(n) * 7) % db.textures.shape[0]
mp = pytest.MonkeyPatch()
ref_img, ref_mask, ref_sat, env_ref, fogged_ref = T._run_reference(
    refns, bg, depth, rec, tex_choice, db.textures.astype(np.float64), mp)[:5]
mp.undo()
rm = ref_mask > 0.03
print(f"reference mask px: {rm.sum()}")

# --- raintpu render with (dx, dy) content offset ----------------------
from raintpu.ops import rasterize as raster_ops
from raintpu.particles.schema import pack_drop_batch
from raintpu.render.camera import CameraSettings, RenderSettings
from raintpu.render.frame import PipelineConfig, render_frame

bank = texture_bank(db)
settings = RenderSettings(camera=CameraSettings(wh=(W, H), ccd_wh=(W, H)))
raster = raster_ops.RasterConfig(
    buckets=(raster_ops.BucketSpec(48, 32, 6, 64),
             raster_ops.BucketSpec(128, 96, 16, 16)))
cfg = PipelineConfig(settings=settings, image_hw=(H, W),
                     fallrate=100.0, raster=raster, env_downsample=2)

orig_geo = raster_ops.drop_geometry
orig_sel = raster_ops.select_textures
OFF = [0.0, 0.0]

def shifted_geometry(*a, **kw):
    g = orig_geo(*a, **kw)
    return raster_ops.DropGeometry(
        M=g.M, min_c=g.min_c + jnp.asarray(OFF, jnp.float32),
        content_wh=g.content_wh, sigma=g.sigma, shift=g.shift)

def fixed_select(drops, edges, key, offset=0):
    full = np.zeros(drops.ratio.shape[0], np.int32)
    full[:n] = tex_choice
    return jnp.asarray(full)

raster_ops.drop_geometry = shifted_geometry
raster_ops.select_textures = fixed_select

from functools import partial

@partial(jax.jit, static_argnames=())
def _render(dbatch, key):
    return render_frame(jnp.asarray(bg), jnp.asarray(depth), dbatch,
                        bank, jnp.asarray(db.bin_edges), key, cfg)

dbatch = pack_drop_batch(rec, 64)
key = jax.random.PRNGKey(0)

def render_mask(dx, dy):
    OFF[0], OFF[1] = dx, dy
    out = render_frame(jnp.asarray(bg), jnp.asarray(depth), dbatch,
                       bank, jnp.asarray(db.bin_edges), key, cfg)
    return np.asarray(out.rain_mask)

def strict_iou(gm):
    union = (gm | rm).sum()
    return (gm & rm).sum() / union if union else 1.0

import time
t0 = time.time()
grid = np.linspace(-0.5, 0.5, 9)
best = (-1.0, 0.0, 0.0)
surface = np.zeros((len(grid), len(grid)))
for iy, dy in enumerate(grid):
    for ix, dx in enumerate(grid):
        gm = render_mask(dx, dy) > 0.03
        iou = strict_iou(gm)
        surface[iy, ix] = iou
        if iou > best[0]:
            best = (iou, dx, dy)
    print(f"dy={dy:+.3f}: " + " ".join(f"{v:.3f}" for v in surface[iy]))
print(f"scan took {time.time()-t0:.1f}s")
print(f"baseline (0,0): {surface[4,4]:.4f}")
print(f"best: IoU={best[0]:.4f} at dx={best[1]:+.3f}, dy={best[2]:+.3f}")

# --- decomposition at (0,0) and at best ------------------------------
import cv2
k = np.ones((3, 3), np.uint8)

def decompose(gm, label):
    union = (gm | rm).sum()
    inter = (gm & rm).sum()
    disagree = (gm ^ rm)
    rd = cv2.dilate(rm.astype(np.uint8), k) > 0
    gd = cv2.dilate(gm.astype(np.uint8), k) > 0
    # edge-band disagreement: within 1px of the other mask's support
    edge = (gm & ~rm & rd) | (rm & ~gm & gd)
    interior = disagree & ~edge
    print(f"{label}: IoU={inter/union:.4f} union={union} "
          f"disagree={disagree.sum()} edge-band={edge.sum()} "
          f"interior={interior.sum()} "
          f"(raintpu-only-int={int((gm & ~rm & ~rd).sum())}, "
          f"ref-only-int={int((rm & ~gm & ~gd).sum())})")

gm0 = render_mask(0.0, 0.0) > 0.03
decompose(gm0, "offset (0,0)")
gmb = render_mask(best[1], best[2]) > 0.03
decompose(gmb, f"offset best ({best[1]:+.3f},{best[2]:+.3f})")

# --- threshold sensitivity: is the gap AA-values near the cutoff? ----
m0 = render_mask(0.0, 0.0)
for thr in (0.01, 0.03, 0.06, 0.1, 0.2):
    g = m0 > thr
    r = ref_mask > thr
    u = (g | r).sum()
    print(f"thr={thr}: strict IoU={(g & r).sum()/u:.4f} union={u}")
