"""TPU self-check: value parity of the fused TPU path vs interpret mode.

Renders one small batched scene twice with bit-identical inputs —
once through the fused Pallas kernel compiled for the TPU, once in
Pallas interpret mode (pure jnp semantics) — and asserts the rain
masks and images agree within tolerance. All data is passed as jit
ARGUMENTS (closed-over arrays trip the TPU constant-folding miscompile
documented in CLAUDE.md — which is exactly the class of silent failure
this check exists to catch).

Run on a TPU host:  python -m raintpu.tools.tpu_selfcheck
Exits nonzero (assert) if the TPU render diverges or renders nothing.
"""

from __future__ import annotations

import json
import os


def build_scene(B=2, H=96, W=256, fallrate=100.0, capacity=64):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raintpu.data.textures import procedural_streak_database, texture_bank
    from raintpu.ops.rasterize import BucketSpec, RasterConfig
    from raintpu.physics.simulator import SimConfig, simulate_frames
    from raintpu.render.camera import CameraSettings, RenderSettings
    from raintpu.render.frame import PipelineConfig

    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    raster = RasterConfig(buckets=(
        BucketSpec(40, 32, 5, capacity, 16, 8),
        BucketSpec(96, 64, 12, max(8, capacity // 2), 24, 10),
    ))
    cfg = PipelineConfig(settings=settings, image_hw=(H, W),
                         fallrate=fallrate, raster=raster,
                         env_downsample=4, composite_mode="fused")
    # Two populations so the value check covers every kernel parameter
    # class: frame 0 = the standard mix (strip/pair modes, modal blur
    # at the heavy-defocus end), frame 1 = a NEAR-FIELD population
    # (z <= 2 m) with Big perspective drops, image-clipped canvas bands
    # (P_UL..P_VU) and the heaviest blur.
    sim_cfg = SimConfig(image_wh=(W, H), focal_px=(300.0, 300.0),
                        exposure_s=2e-3, capacity=capacity, z_max=6.0)
    drops = simulate_frames(jax.random.PRNGKey(1), sim_cfg,
                            jnp.full(B, fallrate), jnp.full(B, 5.0),
                            jnp.full(B, 2e-3), jnp.ones(B))
    if B >= 2:
        sim_close = SimConfig(image_wh=(W, H), focal_px=(500.0, 500.0),
                              exposure_s=2e-3, capacity=capacity,
                              z_max=2.0)
        close = simulate_frames(jax.random.PRNGKey(7), sim_close,
                                jnp.full(1, 60.0), jnp.full(1, 6.0),
                                jnp.full(1, 2e-3), jnp.ones(1))
        drops = jax.tree.map(
            lambda a, c: jnp.concatenate([a[:-1], c], axis=0),
            drops, close)
    rng = np.random.RandomState(0)
    bg = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W) * 40 + 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    db = procedural_streak_database()
    tex = texture_bank(db)
    edges = jnp.asarray(db.bin_edges)
    return cfg, (bg, depth, drops, tex, edges, keys)


def kernel_modes_ok(pair_eval: bool, row_strip: bool,
                    fields_dtype: str = "float32") -> bool:
    """Value-check one kernel-mode combination: compiled vs interpret.

    Renders the small self-check scene through the fused kernel with
    the given modes twice — compiled for the current backend and in
    Pallas interpret mode — and returns True iff both produce real rain
    and agree within the selfcheck tolerance. This is the shared gate
    ``raintpu.render.frame.resolve_kernel_modes`` and bench.py use
    before trusting a mode that may never have compiled through Mosaic
    on real hardware.
    """
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp

    from raintpu.render import frame as frame_mod

    cfg, (bg, depth, drops, tex, edges, keys) = build_scene()
    cfg = dataclasses.replace(cfg, pair_eval=pair_eval,
                              row_strip=row_strip,
                              fields_dtype=fields_dtype)

    @partial(jax.jit, static_argnames=("interpret",))
    def run(bg, depth, drops, tex, edges, keys, interpret):
        return frame_mod._render_frames_fused(
            bg, depth, drops, tex, edges, keys, cfg, interpret=interpret)

    hw = run(bg, depth, drops, tex, edges, keys, interpret=False)
    it = run(bg, depth, drops, tex, edges, keys, interpret=True)
    m_hw = float(jnp.sum(hw.rain_mask))
    m_it = float(jnp.sum(it.rain_mask))
    diff = float(jnp.max(jnp.abs(hw.rainy_image - it.rainy_image)))
    return m_hw > 1.0 and m_it > 1.0 and diff < 5e-2


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    from functools import partial

    from raintpu.render import frame as frame_mod

    cfg, (bg, depth, drops, tex, edges, keys) = build_scene()

    @partial(jax.jit, static_argnames=("interpret",))
    def run(bg, depth, drops, tex, edges, keys, interpret):
        return frame_mod._render_frames_fused(
            bg, depth, drops, tex, edges, keys, cfg, interpret=interpret)

    out_hw = run(bg, depth, drops, tex, edges, keys, interpret=False)
    out_it = run(bg, depth, drops, tex, edges, keys, interpret=True)

    m_hw = float(jnp.sum(out_hw.rain_mask))
    m_it = float(jnp.sum(out_it.rain_mask))
    img_diff = float(jnp.max(jnp.abs(out_hw.rainy_image
                                     - out_it.rainy_image)))
    mask_diff = float(jnp.max(jnp.abs(out_hw.rain_mask
                                      - out_it.rain_mask)))

    n_drops = int(np.asarray(drops.count()).sum())
    result = {
        "backend": jax.default_backend(),
        "drops": n_drops,
        "mask_mass_hw": round(m_hw, 3),
        "mask_mass_interpret": round(m_it, 3),
        "max_mask_diff": mask_diff,
        "max_img_diff": img_diff,
    }
    print(json.dumps(result), flush=True)

    assert m_it > 1.0, f"interpret render produced no rain ({m_it})"
    assert m_hw > 1.0, f"TPU render produced no rain ({m_hw})"
    # Transcendental lowerings (tanh/cos) differ slightly between the
    # Mosaic kernel and jnp interpret; bound the drift tightly.
    assert mask_diff < 5e-2, f"mask diverged (max {mask_diff})"
    assert img_diff < 5e-2, f"image diverged (max {img_diff})"
    print("TPU self-check PASSED")


if __name__ == "__main__":
    main()
