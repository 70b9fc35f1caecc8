"""On-device weather particle simulator.

TPU-native replacement for the reference's interactive ``AHLSimulation``
C++ binary + pexpect bridge (``tools/simulation.py``; SURVEY.md C11/C13a).
Instead of ticking a particle engine at ``sim_hz`` (2000 Hz) and driving
it through console menus, this simulator exploits two physical facts:

1. raindrops fall at *constant* terminal velocity (they reach it within
   meters), so positions are closed-form in time — no integration loop;
2. the rendered streaks of different camera frames are statistically
   independent at 10 Hz (a drop falls ~1 m between frames, sweeping the
   whole near-field visual volume), and the reference renderer consumes
   frames independently anyway (``generator.py:321``).

So each camera frame *samples* the stationary drop population directly:
a Poisson-distributed count of drops with visibility-aware importance
sampling (only drops with >= ~1 px image width can render as streaks —
everything smaller is the fog term), then projects each drop's motion
over the exposure window into an image-space streak segment. The whole
thing is one vmapped pure function — thousands of frames of "simulation"
per second on a single chip, versus minutes per sequence for the binary.

Outputs are produced directly in the renderer's :class:`DropBatch`
schema (the parse-time y-flip / z-negation of ``bad_weather.py:221-224``
composed in), and can be serialized to the reference's XML interchange
format via :mod:`raintpu.particles.xml_io` for drop-in compatibility.

``normal`` and ``steps`` simulation modes are both supported
(``common/db.py:43-67``): ``steps`` feeds per-camera-frame schedules of
cam_motion (km/h), cam_exposure (ms), cam_focal (mm), rain_fallrate
(mm/hr) — the exact four knobs the reference wrapper drives
(``tools/simulation.py:351-389``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raintpu.physics import dsd
from raintpu.particles.schema import (DropBatch, TYPE_BIG, TYPE_MEDIUM,
                                      TYPE_SMALL)


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static simulation parameters (hashable; jit static arg)."""

    image_wh: Tuple[int, int]           # camera resolution (W, H)
    focal_px: Tuple[float, float]       # focal in pixels (fx, fy)
    exposure_s: float                   # default exposure (s)
    cam_hz: float = 10.0
    capacity: int = 4096                # max drops per frame (static)
    z_min: float = 0.25                 # nearest simulated depth (m)
    z_max: float = 30.0                 # farthest simulated depth (m)
    z_bins: int = 256                   # depth strata for importance sampling
    # Sampling floor on image width: the parse filter discards drops
    # with int(max(iw)) < 1 (bad_weather.py:238), so sampling below 1 px
    # only wastes capacity.
    min_width_px: float = 1.0
    frustum_pad: float = 1.3            # lateral margin factor
    render_scale: float = 1.0           # applied like the XML parse path

    @staticmethod
    def from_settings(settings, capacity: int = 4096) -> "SimConfig":
        cam = settings.camera
        fx = cam.focal * 1e-3 / (cam.ccd_pixsize * 1e-6)
        fx *= cam.wh[0] / cam.ccd_wh[0]
        fy = cam.focal * 1e-3 / (cam.ccd_pixsize * 1e-6)
        fy *= cam.wh[1] / cam.ccd_wh[1]
        return SimConfig(
            image_wh=tuple(cam.wh), focal_px=(fx, fy),
            exposure_s=cam.exposure_s, cam_hz=cam.hz, capacity=capacity,
            render_scale=float(settings.render_scale))


def _depth_grid(cfg: SimConfig):
    """Depth strata centers and widths."""
    edges = jnp.linspace(cfg.z_min, cfg.z_max, cfg.z_bins + 1)
    z_c = (edges[:-1] + edges[1:]) / 2.0
    dz = edges[1:] - edges[:-1]
    return z_c, dz


def _strata_rates(cfg: SimConfig, fallrate) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expected visible-drop count per depth stratum.

    lambda_k = A(z_k) * dz * C(D >= D_vis(z_k)) where A is the (padded)
    frustum cross-section and D_vis the diameter giving min_width_px.
    """
    w, h = cfg.image_wh
    fx, fy = cfg.focal_px
    z_c, dz = _depth_grid(cfg)
    # Frustum cross-section at depth z (m^2), padded for exposure motion.
    area = (w / fx * z_c * cfg.frustum_pad) * (h / fy * z_c * cfg.frustum_pad)
    # Min visible diameter (mm) at this depth.
    d_vis_mm = cfg.min_width_px * z_c / fx * 1000.0
    conc = dsd.concentration_above(d_vis_mm, fallrate)  # drops / m^3
    return area * dz * conc, z_c


def expected_drop_count(cfg: SimConfig, fallrate: float) -> float:
    lam, _ = _strata_rates(cfg, fallrate)
    return float(jnp.sum(lam))


def simulate_frame(key: jax.Array,
                   cfg: SimConfig,
                   fallrate: jnp.ndarray,
                   cam_speed_mps: jnp.ndarray,
                   exposure_s: Optional[jnp.ndarray] = None,
                   focal_scale: jnp.ndarray = 1.0) -> DropBatch:
    """Sample one camera frame's drop population and project streaks.

    fallrate (mm/hr), cam_speed_mps (m/s forward) and exposure may be
    traced scalars — the same compiled function serves a whole ``steps``
    schedule. ``focal_scale`` scales the focal length (cam_focal steps).

    Camera frame: x right, y up (0 at camera height), z negative
    forward (simulator convention; the DropBatch fields come out in the
    renderer's parsed convention: image y flipped, world z negated).
    """
    w, h = cfg.image_wh
    fx = cfg.focal_px[0] * focal_scale
    fy = cfg.focal_px[1] * focal_scale
    t_exp = cfg.exposure_s if exposure_s is None else exposure_s
    n = cfg.capacity

    lam_k, z_c = _strata_rates(cfg, fallrate)
    total = jnp.sum(lam_k)

    k_cnt, k_z, k_zu, k_x, k_y, k_d = jax.random.split(key, 6)

    # Poisson count, clamped to capacity.
    count = jax.random.poisson(k_cnt, total)
    count = jnp.minimum(count, n).astype(jnp.int32)
    valid = jnp.arange(n) < count

    # Depth: categorical over strata + uniform inside the stratum.
    logits = jnp.log(jnp.maximum(lam_k, 1e-30))
    kidx = jax.random.categorical(k_z, logits, shape=(n,))
    dz = (cfg.z_max - cfg.z_min) / cfg.z_bins
    z = z_c[kidx] + (jax.random.uniform(k_zu, (n,)) - 0.5) * dz  # depth (m)

    # Lateral position uniform in the padded frustum slab at depth z.
    half_x = w / cfg.focal_px[0] * z * cfg.frustum_pad / 2.0
    half_y = h / cfg.focal_px[1] * z * cfg.frustum_pad / 2.0
    x = jax.random.uniform(k_x, (n,), minval=-1.0, maxval=1.0) * half_x
    y = jax.random.uniform(k_y, (n,), minval=-1.0, maxval=1.0) * half_y

    # Diameter conditioned on visibility at this depth.
    d_vis_mm = cfg.min_width_px * z / cfg.focal_px[0] * 1000.0
    d_mm = dsd.sample_diameter_above(
        jax.random.uniform(k_d, (n,)), d_vis_mm, fallrate)
    v_term = dsd.terminal_velocity(d_mm)                  # m/s downward

    # Motion over the exposure: drop falls, camera advances (drops move
    # +z toward the camera in camera frame).
    p1 = jnp.stack([x, y, -z], -1)                        # start (camera frame)
    vel = jnp.stack([jnp.zeros_like(v_term), -v_term,
                     jnp.broadcast_to(cam_speed_mps, v_term.shape)], -1)
    p2 = p1 + vel * t_exp

    def project(p):
        depth = jnp.maximum(-p[:, 2], 1e-3)
        u = w / 2.0 + fx * p[:, 0] / depth
        v_top = h / 2.0 - fy * p[:, 1] / depth
        return u, v_top, depth

    u1, v1t, dep1 = project(p1)
    u2, v2t, dep2 = project(p2)
    iw1 = fx * (d_mm * 1e-3) / dep1
    iw2 = fx * (d_mm * 1e-3) / dep2

    # --- Emit in the renderer's parsed convention (bad_weather.py:208-239):
    # scale by render_scale, flip image y, negate world z, round, derive.
    rs = cfg.render_scale
    hs = h / rs
    ws = w / rs
    # NOTE: the reference parses sim image y as measured-from-bottom and
    # flips (y_img = H - y_sim). Our v_top is already top-origin, so the
    # two flips cancel: y_img = v_top / render_scale.
    ip1 = jnp.stack([u1 / rs, v1t / rs], -1)
    ip2 = jnp.stack([u2 / rs, v2t / rs], -1)
    iw1 = iw1 / rs
    iw2 = iw2 / rs
    wp1 = jnp.stack([p1[:, 0], p1[:, 1], -p1[:, 2]], -1)  # z > 0 forward
    wp2 = jnp.stack([p2[:, 0], p2[:, 1], -p2[:, 2]], -1)

    diff = jnp.abs(ip1 - ip2)
    max_width = jnp.maximum(jnp.maximum(iw1, iw2), 0.0).astype(jnp.int32)
    norm = jnp.maximum(jnp.linalg.norm(diff, axis=-1), 1e-9)
    ratio = max_width.astype(jnp.float32) / norm
    ip1r = jnp.round(ip1)
    ip2r = jnp.round(ip2)
    length = jnp.ceil(jnp.linalg.norm(ip1r - ip2r, axis=-1)).astype(jnp.int32)

    # Degenerate filter (bad_weather.py:238) + in-frame culling
    # (generator.py:413-420), fused as validity.
    m = jnp.maximum(hs, ws)

    def _in(p):
        return ((p[:, 0] >= 0) & (p[:, 0] < ws)
                & (p[:, 1] >= 0) & (p[:, 1] < hs))

    valid = (valid & (max_width >= 1) & (length >= 1)
             & (max_width < m) & (length < m)
             & (_in(ip1r) | _in(ip2r)))

    drop_type = jnp.where(max_width >= 4, TYPE_BIG,
                          jnp.where(max_width > 1, TYPE_MEDIUM, TYPE_SMALL))

    return DropBatch(
        ip1=ip1r.astype(jnp.float32), ip2=ip2r.astype(jnp.float32),
        iw1=iw1.astype(jnp.float32), iw2=iw2.astype(jnp.float32),
        wp1=wp1.astype(jnp.float32), wp2=wp2.astype(jnp.float32),
        max_width=max_width, length=jnp.maximum(length, 1), ratio=ratio,
        drop_type=drop_type, valid=valid)


def truncated_count(key: jax.Array, cfg: SimConfig,
                    fallrate: jnp.ndarray) -> jnp.ndarray:
    """Drops lost to the capacity clamp for this (key, fallrate).

    Replays simulate_frame's exact count draw (same key split, same
    Poisson stream), so the returned loss is exact, not an estimate —
    callers surface it as the ``truncated_drops`` stat.
    """
    lam_k, _ = _strata_rates(cfg, fallrate)
    total = jnp.sum(lam_k)
    k_cnt = jax.random.split(key, 6)[0]
    count = jax.random.poisson(k_cnt, total)
    return jnp.maximum(count - cfg.capacity, 0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg",))
def simulate_frames(key: jax.Array, cfg: SimConfig,
                    fallrate: jnp.ndarray,
                    cam_speed_mps: jnp.ndarray,
                    exposure_s: jnp.ndarray,
                    focal_scale: jnp.ndarray) -> DropBatch:
    """Vmapped multi-frame simulation.

    fallrate/cam_speed/exposure/focal_scale: (B,) per-frame values (a
    ``steps`` schedule, or broadcast constants for ``normal`` mode).
    Returns a DropBatch with leading dim B.
    """
    keys = jax.random.split(key, fallrate.shape[0])
    return jax.vmap(lambda k, f, s, e, fo: simulate_frame(
        k, cfg, f, s, e, fo))(keys, fallrate, cam_speed_mps, exposure_s,
                              focal_scale)


@partial(jax.jit, static_argnames=("cfg",))
def simulate_frames_keyed(keys: jax.Array, cfg: SimConfig,
                          fallrate: jnp.ndarray,
                          cam_speed_mps: jnp.ndarray,
                          exposure_s: jnp.ndarray,
                          focal_scale: jnp.ndarray) -> DropBatch:
    """Like :func:`simulate_frames` but with caller-supplied per-frame
    keys (the online job derives key[i] = fold_in(seed, frame_idx) so a
    frame's drops are independent of batching). Jitted with ``cfg``
    static — one compiled executable per SimConfig, cached by jax."""
    return jax.vmap(lambda k, f, s, e, fo: simulate_frame(
        k, cfg, f, s, e, fo))(keys, fallrate, cam_speed_mps, exposure_s,
                              focal_scale)


@partial(jax.jit, static_argnames=("cfg",))
def truncated_counts(keys: jax.Array, cfg: SimConfig,
                     fallrate: jnp.ndarray) -> jnp.ndarray:
    """Vmapped :func:`truncated_count`, jitted per SimConfig."""
    return jax.vmap(lambda k, f: truncated_count(k, cfg, f))(keys, fallrate)


def schedule_from_settings(settings, fallrate: float,
                           n_frames: Optional[int] = None):
    """Build per-frame (fallrate, speed, exposure, focal_scale) arrays
    from reference-style sim settings (normal or steps mode).

    In ``normal`` mode the frame count is sim_duration * cam_hz
    (``common/db.py:66``); in ``steps`` mode it is the longest schedule
    (``tools/simulation.py:375-376``), one step per camera frame.
    """
    cam = settings.camera
    sim = settings.sim
    steps = sim.steps_dict()
    if sim.mode == "steps" and steps:
        n = max(len(v) for v in steps.values())
    else:
        n = int(round(sim.duration * cam.hz))
    if n_frames is not None:
        n = n_frames

    def sched(name, default):
        vals = steps.get(name)
        if sim.mode == "steps" and vals:
            arr = np.asarray(vals, np.float32)
            # The i-th step value persists once applied (db.py:60-62).
            out = np.full((n,), arr[-1], np.float32)
            out[:min(n, len(arr))] = arr[:n]
            return out
        return np.full((n,), default, np.float32)

    fall = sched("rain_fallrate", float(fallrate))
    speed_kmh = sched("cam_motion", 0.0)
    exposure_ms = sched("cam_exposure", cam.exposure)
    focal_mm = sched("cam_focal", cam.focal)
    return (jnp.asarray(fall),
            jnp.asarray(speed_kmh / 3.6),
            jnp.asarray(exposure_ms * 1e-3),
            jnp.asarray(focal_mm / cam.focal))
