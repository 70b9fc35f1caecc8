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
                    fields_dtype: str = "float32",
                    narrow_dma: bool = False,
                    resident: bool = False) -> bool:
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
                              fields_dtype=fields_dtype,
                              narrow_dma=narrow_dma,
                              resident=resident)

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


FOG_F64_BOUND = 5e-3


def fog_precision_check(H=375, W=1242):
    """Max abs diff of the device fog stage vs a float64 host oracle at
    the KITTI production shape.

    This pins the KNOWN, ACCEPTED precision loss of the production fog
    path on TPU: XLA f32 matmuls truncate operands to bf16 (measured
    ~1.2e-3 on the blur — BASELINE.md round-4-late), and the dense band
    matmuls (round 5) carry the same class of error. The accepted bound
    is FOG_F64_BOUND; the ~2e-6 split-float Pallas blur exists for
    callers that need better (ops/pallas/blur_kernel.py). Reference
    model: /root/reference/common/add_attenuation.py:75-87.
    """
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raintpu.ops import fog as fog_ops
    from raintpu.ops.blur import _blur_matrix, cv2_gaussian_kernel

    rng = np.random.RandomState(3)
    img = rng.rand(H, W, 3).astype(np.float32)
    depth = (rng.rand(H, W).astype(np.float32) * 80 + 2)
    kwargs = dict(rain_intensity=10.0, f_number=6.0, exposure_s=2e-3,
                  camera_gain=20.0)
    got = np.asarray(jax.jit(
        lambda i, d: fog_ops.fog_rain_layer(i, d, **kwargs))(
        jnp.asarray(img), jnp.asarray(depth)))

    # float64 host oracle (independent precision, same REFLECT_101
    # truncated-Gaussian semantics via the band matrices).
    i64, d64 = img.astype(np.float64), depth.astype(np.float64)
    b_ext = fog_ops.beta_ext(10.0)
    f_ext = np.exp(-b_ext * d64 / 1000.0)
    irr = 4.0 * 36.0 * i64 / (2e-3 * 20.0 * math.pi)
    c = fog_ops.beta_hg(90.0) * irr.reshape(-1, 3).mean(0)
    l_in = np.clip(c[None, None] * (1.0 - f_ext)[..., None], 0, 1)
    k = cv2_gaussian_kernel(25, 25.0)
    kk = ("f64oracle", 25)
    Kh = _blur_matrix(H, kk, k).astype(np.float64)
    Kw = _blur_matrix(W, kk, k).astype(np.float64)

    def blur64(x):
        return np.einsum("ij,jw->iw", Kh, np.einsum("hj,oj->ho", x, Kw))

    f_ext_b = blur64(f_ext)
    l_in_b = np.stack([blur64(l_in[..., ch]) for ch in range(3)], -1)
    want = np.clip(i64 * f_ext_b[..., None] + l_in_b, 0, 1)
    return float(np.max(np.abs(got - want)))


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

    fog_diff = fog_precision_check()

    n_drops = int(np.asarray(drops.count()).sum())
    result = {
        "backend": jax.default_backend(),
        "drops": n_drops,
        "mask_mass_hw": round(m_hw, 3),
        "mask_mass_interpret": round(m_it, 3),
        "max_mask_diff": mask_diff,
        "max_img_diff": img_diff,
        "fog_vs_f64": fog_diff,
    }
    print(json.dumps(result), flush=True)

    assert m_it > 1.0, f"interpret render produced no rain ({m_it})"
    assert m_hw > 1.0, f"TPU render produced no rain ({m_hw})"
    # Transcendental lowerings (tanh/cos) differ slightly between the
    # Mosaic kernel and jnp interpret; bound the drift tightly.
    assert mask_diff < 5e-2, f"mask diverged (max {mask_diff})"
    assert img_diff < 5e-2, f"image diverged (max {img_diff})"
    assert fog_diff < FOG_F64_BOUND, (
        f"fog vs f64 oracle {fog_diff:.2e} exceeds the accepted TPU "
        f"matmul-truncation bound {FOG_F64_BOUND}")
    print("TPU self-check PASSED")


if __name__ == "__main__":
    main()
