"""Online rendering: on-device particle simulation, no XML files.

BASELINE config 5 — the mode the reference cannot do: rain is simulated
per frame by :mod:`raintpu.physics.simulator` directly into the
renderer's drop schema, enabling streaming weather augmentation (e.g.
training-time augmentation of arbitrary video) without any precomputed
particle files. Optionally exports the simulation in the reference XML
format for interop (``--export_xml``).
"""

from __future__ import annotations

import os

import numpy as np

from raintpu.particles import xml_io
from raintpu.physics.simulator import (SimConfig, schedule_from_settings,
                                       simulate_frame)
from raintpu.render.camera import settings_from_dict
from raintpu.render.pipeline import RenderJob


class OnlineRenderJob(RenderJob):
    """RenderJob whose drop source is the on-device simulator."""

    export_xml: bool = False

    def _setup_drop_source(self, seq, w_i, weather, hw) -> None:
        s = self.spec
        rsettings = settings_from_dict(s.settings)
        # Per-sequence sim overrides (regex-matched), like db.sim.
        from raintpu.data import db as db_mod
        try:
            sim_spec = db_mod.sim(s.dataset, seq, "")
            rsettings = settings_from_dict(sim_spec["options"])
        except ImportError:
            pass

        self._sim_cfg = SimConfig.from_settings(
            rsettings, capacity=s.drop_capacity)
        (self._sched_fall, self._sched_speed, self._sched_expo,
         self._sched_focal) = (np.asarray(a) for a in
                               schedule_from_settings(
                                   rsettings, weather["fallrate"]))
        self._sim_seed = s.seed
        self._export_frames = [] if self.export_xml else None

    def _drops_for_frame(self, frame_idx: int):
        import jax

        n = len(self._sched_fall)
        i = frame_idx % n
        key = jax.random.fold_in(
            jax.random.PRNGKey(self._sim_seed), frame_idx)
        batch = simulate_frame(
            key, self._sim_cfg,
            float(self._sched_fall[i]), float(self._sched_speed[i]),
            float(self._sched_expo[i]), float(self._sched_focal[i]))
        if self._export_frames is not None:
            raw = xml_io.batch_to_raw_frames(
                batch, self._sim_cfg.image_wh,
                cam_hz=self._sim_cfg.cam_hz,
                exposure_s=float(self._sched_expo[i]),
                render_scale=self._sim_cfg.render_scale,
                focal_px=float(self._sim_cfg.focal_px[0]))
            raw[0]["id"] = frame_idx
            self._export_frames.append(raw[0])
        return batch

    def finish_export(self, out_dir: str) -> str:
        path = os.path.join(out_dir, "0000_camera0.xml")
        xml_io.write_particles_xml(path, self._export_frames or [])
        return path
