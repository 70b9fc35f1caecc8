"""raintpu — a TPU-native physics-based rain-rendering framework.

Re-implements the full capability surface of astra-vision/rain-rendering
(IJCV 2020, "Rain Rendering for Evaluating and Improving Robustness to Bad
Weather") as an idiomatic JAX/XLA/Pallas framework:

- the per-drop CPU compositing loop of the reference
  (``common/generator.py:431`` / ``common/bad_weather.py:336``) becomes a
  batched, order-independent field-accumulation pipeline over padded drop
  arrays (see :mod:`raintpu.render.frame`);
- the external interactive C++ particle simulator (``AHLSimulation``,
  driven by ``tools/simulation.py``) becomes an on-device vmapped dynamics
  step (:mod:`raintpu.physics.simulator`) that can also read/write the
  reference's particle-XML interchange format
  (:mod:`raintpu.particles.xml_io`);
- scaling is data-parallel over frames + drop-parallel within a frame via
  ``jax.sharding`` meshes (:mod:`raintpu.parallel`), replacing the
  reference's subprocess farm (``main_threaded.py``).

Public API mirrors the reference's plugin contract (``common/db.py:83-107``):
dataset config modules export ``resolve_paths``/``settings`` and the CLI
(:mod:`raintpu.cli`) accepts the same flags as the reference ``main.py``.
"""

__version__ = "0.1.0"

from raintpu.render.camera import CameraSettings, RenderSettings  # noqa: F401
