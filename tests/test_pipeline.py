"""End-to-end pipeline tests: tiny on-disk dataset -> rendered outputs.

Mirrors the reference's de-facto regression strategy (SURVEY.md §4):
render a tiny fixture twice and diff, plus conflict-strategy and
determinism checks.
"""

import os

import numpy as np
import pytest
from PIL import Image

from raintpu.render.pipeline import JobSpec, RenderJob


H, W = 48, 96


def make_dataset(root, n_frames=3):
    """customdb-style layout: SEQ/rgb + SEQ/depth (16-bit PNG m*256)."""
    rng = np.random.RandomState(1)
    rgb_dir = os.path.join(root, "source", "toy", "seqA", "rgb")
    dep_dir = os.path.join(root, "source", "toy", "seqA", "depth")
    os.makedirs(rgb_dir)
    os.makedirs(dep_dir)
    for i in range(n_frames):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(rgb_dir, f"{i:06d}.png"))
        dep = ((rng.rand(H, W) * 60 + 3) * 256).astype(np.uint16)
        Image.fromarray(dep).save(os.path.join(dep_dir, f"{i:06d}.png"))
    return os.path.join(root, "source", "toy")


def make_particles(root, image_wh, fallrate=25):
    """Simulate + export XML with the reference layout."""
    from raintpu.tools.particles_simulation import simulate_to_xml

    options = {
        "cam_WH": list(image_wh), "cam_CCD_WH": list(image_wh),
        "cam_CCD_pixsize": 20.0, "cam_focal": 8, "cam_hz": 10,
        "cam_exposure": 2, "sim_mode": "normal", "sim_duration": 0.5,
    }
    out_dir = os.path.join(root, "particles", "toy", "seqA", "rain",
                           f"{fallrate}mm")
    return simulate_to_xml(out_dir, options,
                           {"weather": "rain", "fallrate": fallrate},
                           capacity=128)


def make_spec(tmp, xml, **kw):
    settings = {
        "cam_hz": 10, "cam_CCD_WH": [W, H], "cam_CCD_pixsize": 20.0,
        "cam_WH": [W, H], "cam_focal": 8, "cam_gain": 20,
        "cam_f_number": 6.0, "cam_focus_plane": 6.0, "cam_exposure": 2,
        "cam_pos": [1.5, 1.5, 0.3], "cam_lookat": [1.5, 1.5, -1.0],
        "cam_up": [0.0, 1.0, 0.0], "depth_scale": 1, "render_scale": 1,
        "sim_mode": "normal", "sim_duration": 0.5, "sim_steps": {},
        "sim_hz": 2000, "sequences": {},
    }
    base = dict(
        dataset="toy", sequences=["seqA"],
        images={"seqA": os.path.join(tmp, "source", "toy", "seqA", "rgb")},
        depth={"seqA": os.path.join(tmp, "source", "toy", "seqA", "depth")},
        calib={"seqA": None},
        particles={"seqA": [xml]},
        weather=[{"weather": "rain", "fallrate": 25}],
        settings=settings,
        output_root=os.path.join(tmp, "output"),
        conflict_strategy="overwrite",
        batch_size=2, drop_capacity=128, raster_profile="tiny",
        verbose=False)
    base.update(kw)
    return JobSpec(**base)


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("toy_ds"))
    make_dataset(tmp)
    xml = make_particles(tmp, (W, H))
    return tmp, xml


def test_end_to_end_render(toy):
    tmp, xml = toy
    stats = RenderJob(make_spec(tmp, xml)).run()
    assert stats["rendered"] == 3
    out = os.path.join(tmp, "output", "toy", "seqA", "rain", "25mm")
    imgs = sorted(os.listdir(os.path.join(out, "rainy_image")))
    assert imgs == ["000000.png", "000001.png", "000002.png"]
    masks = os.listdir(os.path.join(out, "rain_mask"))
    assert len(masks) == 6  # colormapped + _raw 16-bit companions
    arr = np.asarray(Image.open(
        os.path.join(out, "rainy_image", imgs[0])))
    assert arr.shape == (H, W, 3)
    assert arr.std() > 1  # not a constant image


def test_save_format_npy(toy):
    # --save_format npy: raw-array outputs (rainy uint8, mask float32)
    # so disk-to-disk throughput isn't capped by host PNG/zlib encode.
    tmp, xml = toy
    spec = make_spec(tmp, xml, save_format="npy",
                     output_root=os.path.join(tmp, "output_npy"),
                     save_envmap=True)
    stats = RenderJob(spec).run()
    assert stats["rendered"] == 3
    out = os.path.join(tmp, "output_npy", "toy", "seqA", "rain", "25mm")
    imgs = sorted(os.listdir(os.path.join(out, "rainy_image")))
    assert imgs == ["000000.npy", "000001.npy", "000002.npy"]
    arr = np.load(os.path.join(out, "rainy_image", imgs[0]))
    assert arr.dtype == np.uint8 and arr.shape == (H, W, 3)
    # npy rainy content == the PNG run's content (same seed/config).
    png = np.asarray(Image.open(os.path.join(
        tmp, "output", "toy", "seqA", "rain", "25mm",
        "rainy_image", "000000.png")))
    np.testing.assert_array_equal(arr, png)
    mask = np.load(os.path.join(out, "rain_mask", "000000.npy"))
    assert mask.dtype == np.float32 and mask.shape == (H, W)
    envs = sorted(os.listdir(os.path.join(
        tmp, "output_npy", "toy", "seqA", "envmap")))
    assert envs and all(e.endswith(".npy") for e in envs)
    # skip strategy must key on the npy outputs
    spec2 = make_spec(tmp, xml, save_format="npy",
                      output_root=os.path.join(tmp, "output_npy"),
                      conflict_strategy="skip")
    assert RenderJob(spec2).run()["skipped"] == 3


def test_skip_strategy_resumes(toy):
    tmp, xml = toy
    spec = make_spec(tmp, xml, conflict_strategy="skip")
    stats = RenderJob(spec).run()
    assert stats["rendered"] == 0
    assert stats["skipped"] == 3


def test_determinism_rerender_identical(toy):
    tmp, xml = toy
    out = os.path.join(tmp, "output", "toy", "seqA", "rain", "25mm")
    first = np.asarray(Image.open(
        os.path.join(out, "rainy_image", "000001.png"))).copy()
    RenderJob(make_spec(tmp, xml, conflict_strategy="overwrite")).run()
    second = np.asarray(Image.open(
        os.path.join(out, "rainy_image", "000001.png")))
    np.testing.assert_array_equal(first, second)


def test_frame_window(toy):
    tmp, xml = toy
    spec = make_spec(
        tmp, xml, frame_start=1, frame_end=2,
        output_root=os.path.join(tmp, "output_window"))
    stats = RenderJob(spec).run()
    assert stats["rendered"] == 1
    out = os.path.join(tmp, "output_window", "toy", "seqA", "rain",
                       "25mm", "rainy_image")
    assert os.listdir(out) == ["000001.png"]


def test_frame_determinism_independent_of_start(toy):
    # Reference behavior: per-frame seeding makes output independent of
    # --frame_start (generator.py:303,317-318).
    tmp, xml = toy
    a = np.asarray(Image.open(os.path.join(
        tmp, "output", "toy", "seqA", "rain", "25mm", "rainy_image",
        "000001.png")))
    b = np.asarray(Image.open(os.path.join(
        tmp, "output_window", "toy", "seqA", "rain", "25mm",
        "rainy_image", "000001.png")))
    np.testing.assert_array_equal(a, b)


def test_rename_folder_strategy(toy):
    tmp, xml = toy
    spec = make_spec(tmp, xml, conflict_strategy="rename_folder")
    RenderJob(spec).run()
    seq_dir = os.path.join(tmp, "output", "toy", "seqA", "rain")
    assert "25mm_copy00000" in os.listdir(seq_dir)


def test_online_job(toy):
    tmp, _xml = toy
    from raintpu.render.online import OnlineRenderJob

    spec = make_spec(tmp, None, particles={"seqA": [None]},
                     output_root=os.path.join(tmp, "output_online"))
    stats = OnlineRenderJob(spec).run()
    assert stats["rendered"] == 3
    assert stats["truncated_drops"] == 0
    out = os.path.join(tmp, "output_online", "toy", "seqA", "rain",
                       "25mm", "rainy_image")
    assert len(os.listdir(out)) == 3


def test_online_batched_matches_eager(toy):
    """_simulate_batch (one jitted vmapped sim call) must match the
    per-frame eager path — same per-frame keys by construction. The
    RNG draws are bit-identical (same key per frame); float values may
    differ by jit-vs-eager fusion rounding (~1e-7 rel), so the discrete
    fields are exact and the continuous ones tightly toleranced.
    (_drops_for_frames additionally compacts for render — covered by
    test_online_compaction below.)"""
    import jax
    import numpy as np
    from raintpu.render.online import OnlineRenderJob

    tmp, _xml = toy
    spec = make_spec(tmp, None, particles={"seqA": [None]})
    job = OnlineRenderJob(spec)
    job._setup_drop_source("seqA", 0, spec.weather[0], (H, W))

    batched = job._simulate_batch([0, 1, 2])
    for i in range(3):
        one = job._drops_for_frame(i)
        got = jax.tree.map(lambda a: np.asarray(a)[i], batched)
        for f in ("ip1", "ip2", "valid", "max_width", "length"):
            np.testing.assert_array_equal(
                np.asarray(getattr(one, f)), getattr(got, f), err_msg=f)
        for f in ("iw1", "iw2"):
            np.testing.assert_allclose(
                np.asarray(getattr(one, f)), getattr(got, f),
                rtol=1e-6, err_msg=f)


def test_online_compaction(toy):
    """_drops_for_frames compacts the simulated batch for render: the
    valid population is preserved drop-for-drop (packed order), the
    per-drop axis shrinks to the fitted capacity, and nothing is
    counted truncated when the capacity holds."""
    import numpy as np
    from raintpu.render.online import OnlineRenderJob

    tmp, _xml = toy
    # Oversized sim capacity (the realistic online shape: the sim axis
    # holds the pre-cull population) so the fitted render capacity is
    # strictly smaller and compaction actually engages.
    spec = make_spec(tmp, None, particles={"seqA": [None]},
                     drop_capacity=512)
    job = OnlineRenderJob(spec)
    job._setup_drop_source("seqA", 0, spec.weather[0], (H, W))

    raw = job._simulate_batch([0, 1, 2])
    before = int(job._truncated_total)
    got = job._drops_for_frames([0, 1, 2])
    assert job._render_cap is not None
    assert got.valid.shape[-1] == job._render_cap
    assert got.valid.shape[-1] < raw.valid.shape[-1]  # actually shrank
    assert int(job._truncated_total) == before  # capacity held
    rv = np.asarray(raw.valid)
    gv = np.asarray(got.valid)
    assert (gv.sum(-1) == rv.sum(-1)).all()
    for f in ("ip1", "iw1", "length", "drop_type"):
        ra = np.asarray(getattr(raw, f))
        ga = np.asarray(getattr(got, f))
        for b in range(rv.shape[0]):
            np.testing.assert_array_equal(ga[b][gv[b]], ra[b][rv[b]],
                                          err_msg=f)


def test_online_compaction_refits_on_overflow(toy):
    """A batch exceeding the fitted render capacity must REFIT the
    capacity upward (one recompile) instead of silently dropping drops
    from the rendered frame (round-3 ADVICE)."""
    import jax
    import numpy as np
    from raintpu.render.online import OnlineRenderJob

    tmp, _xml = toy
    spec = make_spec(tmp, None, particles={"seqA": [None]},
                     drop_capacity=512)
    job = OnlineRenderJob(spec)
    job._setup_drop_source("seqA", 0, spec.weather[0], (H, W))

    raw = job._simulate_batch([0, 1, 2])
    n_valid = int(np.asarray(raw.valid).sum(-1).max())
    assert n_valid >= 2  # toy scene is tiny; just needs to overflow cap
    # Pretend an earlier, lighter batch fitted a too-small capacity.
    from raintpu.particles.schema import compact_drop_batch
    job._render_cap = 1
    job._compact_fn = jax.jit(jax.vmap(
        lambda d: compact_drop_batch(d, 1)))
    before = int(job._truncated_total)

    got = job._compact_for_render(raw)
    assert job._render_cap >= n_valid
    assert got.valid.shape[-1] == job._render_cap or \
        got.valid.shape[-1] == raw.valid.shape[-1]
    # every valid drop survived; nothing counted truncated
    assert (np.asarray(got.valid).sum(-1)
            == np.asarray(raw.valid).sum(-1)).all()
    assert int(job._truncated_total) == before


def test_online_export_xml(toy):
    """--export_xml writes reference-format XML that re-parses into the
    same drop populations (VERDICT item 6)."""
    from raintpu.particles import xml_io
    from raintpu.render.online import OnlineRenderJob

    tmp, _xml = toy
    spec = make_spec(tmp, None, particles={"seqA": [None]},
                     output_root=os.path.join(tmp, "output_export"),
                     conflict_strategy="overwrite")
    job = OnlineRenderJob(spec)
    job.export_xml = True
    stats = job.run()
    assert stats["rendered"] == 3

    root = os.path.join(tmp, "particles_export")
    paths = job.finish_export(root)
    assert paths == [os.path.join(root, "seqA", "rain", "25mm",
                                  "0000_camera0.xml")]
    streaks = xml_io.load_streaks(paths[0], image_wh=(W, H),
                                  render_scale=1, dataset="toy")
    assert sorted(streaks) == [0, 1, 2]
    # Round-trip: parsed drops match the simulator's populations.
    job2 = OnlineRenderJob(spec)
    job2._setup_drop_source("seqA", 0, spec.weather[0], (H, W))
    one = job2._drops_for_frame(1)
    n_valid = int(np.asarray(one.valid).sum())
    assert len(streaks[1]["ip1"]) == n_valid


def test_online_truncation_counted(toy):
    """A capacity far below the population must surface in
    stats['truncated_drops'] instead of silently losing drops."""
    from raintpu.render.online import OnlineRenderJob

    tmp, _xml = toy
    spec = make_spec(tmp, None, particles={"seqA": [None]},
                     drop_capacity=2,
                     weather=[{"weather": "rain", "fallrate": 100}],
                     output_root=os.path.join(tmp, "output_trunc"))
    stats = OnlineRenderJob(spec).run()
    assert stats["truncated_drops"] > 0


def test_pano_env_type(toy):
    """env_type='pano' end-to-end: per-frame captured panoramas are
    used as the environment map (reference generator.py:401-403)."""
    tmp, xml = toy
    panos = os.path.join(tmp, "panos")
    os.makedirs(panos, exist_ok=True)
    rng = np.random.RandomState(7)
    for i in range(3):
        # Strongly colored panos so the drop photometry shifts visibly.
        arr = np.zeros((32, 64, 3), np.uint8)
        arr[..., 0] = 255  # red-dominant environment
        arr[..., 1] = (rng.rand(32, 64) * 40).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(panos, f"{i:06d}.png"))

    spec = make_spec(tmp, xml, env_type="pano", panos_dir=panos,
                     output_root=os.path.join(tmp, "output_pano"))
    stats = RenderJob(spec).run()
    assert stats["rendered"] == 3
    out_pano = np.asarray(Image.open(os.path.join(
        tmp, "output_pano", "toy", "seqA", "rain", "25mm",
        "rainy_image", "000001.png"))).astype(float)
    out_ours = np.asarray(Image.open(os.path.join(
        tmp, "output", "toy", "seqA", "rain", "25mm",
        "rainy_image", "000001.png"))).astype(float)
    # The env source changes drop colors -> output differs from 'ours'.
    assert np.abs(out_pano - out_ours).mean() > 0.01


def test_pano_missing_dir_raises(toy):
    tmp, xml = toy
    spec = make_spec(tmp, xml, env_type="pano",
                     output_root=os.path.join(tmp, "output_pano2"))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="panos_dir"):
        RenderJob(spec).run()


def test_saturation_mask_saved(toy):
    tmp, xml = toy
    spec = make_spec(tmp, xml, save_saturation=True,
                     output_root=os.path.join(tmp, "output_sat"))
    stats = RenderJob(spec).run()
    assert stats["rendered"] == 3
    sat_dir = os.path.join(tmp, "output_sat", "toy", "seqA", "rain",
                           "25mm", "saturation_mask")
    assert sorted(os.listdir(sat_dir)) == [
        "000000.png", "000001.png", "000002.png"]
    arr = np.asarray(Image.open(os.path.join(sat_dir, "000001.png")))
    assert arr.shape == (H, W, 3)
    assert arr.max() > 0  # rain present -> nonzero saturation mass


def test_cli_export_xml_wired(toy, monkeypatch, tmp_path):
    """The --export_xml flag end-to-end through cli.main (was dead
    wiring: VERDICT missing item 5)."""
    from raintpu import cli

    tmp, _xml = toy
    captured = {}

    class FakeJob:
        export_xml = False

        def __init__(self, spec):
            captured["spec"] = spec

        def run(self):
            return {"rendered": 0}

        def finish_export(self, root):
            captured["export_root"] = root
            captured["export_flag"] = self.export_xml
            return [os.path.join(root, "x.xml")]

    import raintpu.render.online as online_mod
    monkeypatch.setattr(online_mod, "OnlineRenderJob", FakeJob)
    monkeypatch.setattr(
        cli, "check_args",
        lambda argv: __import__("types").SimpleNamespace(
            args=__import__("argparse").Namespace(
                dataset="toy", online=True, export_xml=True,
                particles=str(tmp_path), output=str(tmp_path),
                texture=None, norm_coeff=None, conflict_strategy=None,
                rendering_strategy=None, save_envmap=False,
                frame_start=0, frame_end=None, frame_step=1, frames=None,
                noise_scale=0.0, noise_std=0.0, opacity_attenuation=1.0,
                verbose=False, batch_size=2, drop_capacity=8, seed=0),
            settings=make_spec(tmp, None).settings,
            sequences=["seqA"], images={}, depth={}, calib={},
            particles={"seqA": [None]},
            weather=[{"weather": "rain", "fallrate": 25}]))
    assert cli.main([]) == 0
    assert captured["export_flag"] is True
    assert captured["export_root"] == os.path.join(str(tmp_path), "toy")


def test_fitted_raster_profile(toy, tmp_path):
    """raster_profile='fitted' fits the bucket ladder to the weather's
    measured drop population (round-3 perf feature) and renders the
    same scene within a small tolerance of the tiny hand ladder."""
    tmp, xml = toy
    spec = make_spec(tmp, xml, raster_profile="fitted",
                     output_root=str(tmp_path / "out_fitted"))
    stats = RenderJob(spec).run()
    assert stats["rendered"] == 3
    assert stats["overflowed_drops"] == 0
    out = os.path.join(str(tmp_path / "out_fitted"), "toy", "seqA",
                       "rain", "25mm")
    fitted = np.asarray(Image.open(
        os.path.join(out, "rainy_image", "000001.png"))).astype(float)
    base = np.asarray(Image.open(os.path.join(
        tmp, "output", "toy", "seqA", "rain", "25mm", "rainy_image",
        "000001.png"))).astype(float)
    # Different ladders (and supersample) change only sub-pixel AA.
    assert np.abs(fitted - base).mean() < 3.0   # uint8 levels


def test_avg_pool_rgb_exact():
    """The banded-matmul block pool (2.3x the reshape-mean pool on v5e
    — the envmap stage cost was the full-res pool, not the one-hot
    resample) must stay EXACT: HIGHEST matmul precision, so no TPU
    bf16-operand truncation leaks into the cds=1 library-exact path."""
    import jax.numpy as jnp

    from raintpu.render.frame import _avg_pool_rgb

    rng = np.random.RandomState(0)
    for shape in [(375, 126, 3), (4, 96, 256, 3), (23, 77, 3)]:
        for ds in (1, 3, 4, 16):
            x = jnp.asarray(rng.rand(*shape).astype(np.float32))
            got = np.asarray(_avg_pool_rgb(x, ds))
            h, w, c = shape[-3:]
            hq, wq = (h // ds) * ds, (w // ds) * ds
            ref = np.asarray(x)[..., :hq, :wq, :].reshape(
                shape[:-3] + (h // ds, ds, w // ds, ds, c)).mean((-4, -2))
            assert got.shape == ref.shape, (shape, ds)
            assert np.abs(got - ref).max() < 1e-5, (shape, ds)


def test_cone_downsample_parity():
    """cone_downsample=4 (the production default, +21% fresh-frame
    throughput measured on v5e) must stay visually identical to the
    exact cone: the block-reduced features preserve solid-angle
    integrals, so the end-to-end rain-pixel effect is ~1.6e-3 at full
    KITTI res (BASELINE.md) — pinned here at a small scene well under
    the 0.03 parity interior bar."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raintpu.render.frame import render_frames
    from raintpu.tools.tpu_selfcheck import build_scene

    cfg, (bg, depth, drops, tex, edges, keys) = build_scene()
    out1 = jax.jit(render_frames, static_argnames="cfg")(
        bg, depth, drops, tex, edges, keys, cfg)
    m1 = float(jnp.sum(out1.rain_mask))
    assert m1 > 1.0

    # Both cds=4 variants — env_fold=True generates the photometry
    # envmap directly at the cds-effective resolution (round 5; full-
    # KITTI effect measured 1.28e-3, SMALLER than unfolded's 1.71e-3),
    # env_fold=False block-reduces the features after generation.
    for fold in (False, True):
        cfg4 = dataclasses.replace(cfg, cone_downsample=4,
                                   env_fold=fold)
        out4 = jax.jit(render_frames, static_argnames="cfg")(
            bg, depth, drops, tex, edges, keys, cfg4)
        img_diff = float(jnp.max(jnp.abs(out1.rainy_image
                                         - out4.rainy_image)))
        mask_inter = float(jnp.sum(jnp.minimum(out1.rain_mask > 0,
                                               out4.rain_mask > 0)))
        mask_union = float(jnp.sum(jnp.maximum(out1.rain_mask > 0,
                                               out4.rain_mask > 0)))
        # This scene is tiny (96x256 with env_downsample=4 underneath),
        # so cds=4's relative coarseness is amplified vs full KITTI res
        # (measured ~0.012 here vs ~1.5e-3 there) — both under the 0.03
        # reference-parity interior bar this knob is held to.
        assert img_diff < 0.025, (fold, img_diff)
        assert mask_inter / mask_union > 0.995, fold
