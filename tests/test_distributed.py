"""Multi-host process boundary: 2-process jax.distributed CPU cluster.

Round-2 VERDICT item 6: parallel/distributed.py was designed but never
executed across a real process boundary. These tests spawn actual
subprocesses that form a jax.distributed cluster over localhost, feed
per-host shards through make_array_from_process_local_data, and run a
sharded computation plus a real sharded render step on the global mesh.
"""

import os
import socket
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from raintpu.parallel import distributed
from raintpu.parallel.mesh import make_mesh

coord, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert len(jax.devices()) == 4, len(jax.devices())      # 2 local x 2

# Work partitioning: contiguous non-overlapping cover of 10 items.
lo, hi = distributed.local_batch_bounds(10)
assert (lo, hi) == ((0, 5) if pid == 0 else (5, 10)), (lo, hi)

# Global array from per-host shards + a sharded computation whose
# result depends on BOTH hosts' data (cross-process collective).
mesh = make_mesh(sp=1)                                   # dp=4
full = np.arange(12, dtype=np.float32).reshape(4, 3)
glob = distributed.make_global_array(
    full[pid * 2:(pid + 1) * 2], mesh, P("dp"))          # (4, 3) global
assert glob.shape == (4, 3), glob.shape

total = jax.jit(
    lambda x: jnp.sum(x),
    out_shardings=jax.sharding.NamedSharding(mesh, P()))(glob)
expected = float(np.arange(0, 12, dtype=np.float32).sum())
assert float(total) == expected, (float(total), expected)

# End-to-end: one sharded render step on the global (dp=4, sp=1) mesh,
# each host feeding its local frames.
from raintpu.data.textures import procedural_streak_database, texture_bank
from raintpu.ops.rasterize import BucketSpec, RasterConfig
from raintpu.physics.simulator import SimConfig, simulate_frames
from raintpu.parallel.mesh import render_frames_sharded
from raintpu.render.camera import CameraSettings, RenderSettings
from raintpu.render.frame import PipelineConfig

W, H, cap, B = 64, 32, 16, 4
db = procedural_streak_database()
bank = texture_bank(db)
sim = SimConfig(image_wh=(W, H), focal_px=(250.0, 250.0),
                exposure_s=2e-3, capacity=cap, z_max=5.0)
drops_all = simulate_frames(jax.random.PRNGKey(1), sim,
                            jnp.full(B, 200.0), jnp.full(B, 5.0),
                            jnp.full(B, 2e-3), jnp.ones(B))
drops_all = jax.tree.map(lambda a: np.asarray(a), drops_all)
rng = np.random.RandomState(0)
bg = rng.rand(B, H, W, 3).astype(np.float32)
depth = (rng.rand(B, H, W) * 40 + 3).astype(np.float32)
keys = np.asarray(jax.random.split(jax.random.PRNGKey(2), B))

lo_b, hi_b = distributed.local_batch_bounds(B)           # 2 frames/host
to_global = lambda a: distributed.make_global_array(
    a[lo_b:hi_b], mesh, P("dp") if a.ndim == 1 else
    P(*(("dp",) + (None,) * (a.ndim - 1))))
g_bg = to_global(bg)
g_depth = to_global(depth)
g_keys = to_global(keys)
g_drops = jax.tree.map(to_global, drops_all)

raster = RasterConfig(buckets=(BucketSpec(24, 24, 3, cap),))
settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                ccd_wh=(W, H)))
cfg = PipelineConfig(settings=settings, image_hw=(H, W), fallrate=200.0,
                     raster=raster, env_downsample=8,
                     composite_mode="xla")
out = render_frames_sharded(mesh, g_bg, g_depth, g_drops, bank,
                            jnp.asarray(db.bin_edges), g_keys, cfg)
# Each host checks its addressable shards: finite, and the whole
# global batch renders rain.
local_mask = np.concatenate(
    [np.asarray(s.data) for s in out.rain_mask.addressable_shards])
assert np.all(np.isfinite(local_mask))
mass = float(jax.jit(
    lambda m: jnp.sum(m),
    out_shardings=jax.sharding.NamedSharding(mesh, P()))(out.rain_mask))
assert mass > 0.0, "sharded render produced no rain"
print(f"WORKER_OK pid={pid} mass={mass:.3f}")
"""

MISCONFIG_WORKER = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from raintpu.parallel import distributed
# No cluster env, no coordinator: auto-init must fail LOUDLY (warning
# with the exception type) but continue single-process.
distributed.initialize()
assert jax.process_count() == 1
print("MISCONFIG_OK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"localhost:{_free_port()}"
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid}" in out, out
    # Both hosts computed the identical global mask mass.
    m0 = [l for l in outs[0].splitlines() if "WORKER_OK" in l][0]
    m1 = [l for l in outs[1].splitlines() if "WORKER_OK" in l][0]
    assert m0.split("mass=")[1] == m1.split("mass=")[1]


def test_misconfigured_cluster_fails_loudly(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(MISCONFIG_WORKER)
    env = {**os.environ, "PYTHONPATH": REPO}
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        env=env, cwd=REPO, timeout=240)
    combined = out.stdout + out.stderr
    assert out.returncode == 0, combined
    assert "MISCONFIG_OK" in combined
    # The warning path must have fired (not silently swallowed).
    assert "jax.distributed auto-init failed" in combined, combined
