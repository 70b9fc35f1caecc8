"""Parity against the ACTUAL upstream reference code.

Round-2 VERDICT item 1: the golden parity tests compare raintpu to a
reimplementation of the reference (tests/ref_numpy) because pyclipper /
imutils / natsort are not installed. This module closes that circularity
by importing /root/reference's real modules with three tiny shims on
sys.path (tests/ref_shims: Sutherland-Hodgman pyclipper, the standard
rotate_bound, natural sort) and running the REAL per-frame pipeline:

    add_attenuation.FogRain.fog_rain_layer    (fog)
    EnvironmentMapGenerator.generate_map      (envmap)
    my_utils.convert_rgb_to_xyY + solid_angle (photometric tables)
    Generator.compute_drop                    (per-drop driver)
      -> FovComputation.compute_fov_plane_points
      -> RainRenderer.add_drop_to_image       (blend)
    mean-contrast adjust                      (generator.py:461-464)

on the same scene the golden tests use, then compares THREE ways:
reference code vs the tests/ref_numpy oracle (validates the oracle),
and reference code vs raintpu (validates the product).

Environment shims that do NOT alter reference behavior: np.int/np.float
restored (removed in numpy>=1.24; aliases of the builtins, exactly what
they meant in the reference's era), matplotlib Agg backend, and
common.db.settings patched to the defaults dict (its import machinery
expects the reference's config/ on the path; add_drop_to_image reads
only settings()["cam_exposure"] = 2 ms, the _settings_defaults value,
common/db.py:18).
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

os.environ.setdefault("MPLBACKEND", "Agg")

SHIMS = os.path.join(os.path.dirname(__file__), "ref_shims")
REF_ROOT = "/root/reference"

H, W = 96, 160
EXPOSURE_S = 2e-3
FOCAL_M = 6e-3


@pytest.fixture(scope="module")
def ref():
    """Import the real reference modules (skips if the tree is absent)."""
    if not os.path.isdir(os.path.join(REF_ROOT, "common")):
        pytest.skip("reference tree not available")
    import matplotlib
    matplotlib.use("Agg")
    # numpy>=1.24 removed the np.int / np.float builtin aliases the
    # 2020-era reference uses; restore them (pure aliases, no behavior
    # change — np.bool is back as an alias in numpy 2.x already).
    np.int = int
    np.float = float
    for p in (SHIMS, REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    import common.add_attenuation as add_attenuation
    import common.bad_weather as bw
    import common.generator as gen
    import common.my_utils as my_utils
    import common.solid_angle as ref_solid_angle
    return SimpleNamespace(bw=bw, gen=gen, my_utils=my_utils,
                           solid_angle=ref_solid_angle,
                           add_attenuation=add_attenuation)


@pytest.fixture(scope="module", params=["base", "close"])
def scene(request):
    """Same construction as test_golden_parity's scene fixture.

    Two populations widen the proof against the real code beyond the
    round-2 single scene: 'base' (the golden 100 mm/hr mix) and
    'close' (a near-field population — big perspective-warped drops
    with heavy defocus, the reference's other rendering branch)."""
    import jax
    from raintpu.physics.simulator import SimConfig, simulate_frame

    rng = np.random.RandomState(2)
    yy = np.linspace(0, 1, H)[:, None] * np.ones((1, W))
    bg = np.stack([0.35 + 0.3 * yy + rng.rand(H, W) * 0.05,
                   0.4 + 0.25 * yy, 0.55 - 0.15 * yy], -1)
    bg = np.clip(bg, 0, 1).astype(np.float32)
    depth = (5 + 150 * (1 - yy)).astype(np.float32)

    if request.param == "close":
        sim = SimConfig(image_wh=(W, H), focal_px=(500.0, 500.0),
                        exposure_s=EXPOSURE_S, capacity=64, z_max=2.0)
        batch = simulate_frame(jax.random.PRNGKey(13), sim, 60.0, 6.0,
                               EXPOSURE_S, 1.0)
    else:
        sim = SimConfig(image_wh=(W, H), focal_px=(500.0, 500.0),
                        exposure_s=EXPOSURE_S, capacity=64, z_max=7.0)
        batch = simulate_frame(jax.random.PRNGKey(11), sim, 100.0, 6.0,
                               EXPOSURE_S, 1.0)
    v = np.asarray(batch.valid)
    rec = {k: np.asarray(getattr(batch, k))[v]
           for k in ("ip1", "ip2", "iw1", "iw2", "wp1", "wp2",
                     "max_width", "length", "ratio", "drop_type")}
    assert len(rec["ip1"]) >= 8
    return bg, depth, rec


def _make_streaks(ref, rec):
    """rec (raintpu's parsed drop record) -> reference Streak objects,
    field-for-field what DBManager.load_streaks_from_xml produces
    (bad_weather.py:208-239): ints for positions, parsed conventions
    already applied on both sides."""
    streaks = []
    for i in range(len(rec["ip1"])):
        s = ref.bw.Streak()
        s.pid = i
        s.world_position_start = np.asarray(rec["wp1"][i], float).copy()
        s.world_position_end = np.asarray(rec["wp2"][i], float).copy()
        s.world_diameter_start = 0.0   # not used by the render path
        s.world_diameter_end = 0.0
        s.image_position_start = \
            np.round(rec["ip1"][i]).astype(int).copy()
        s.image_position_end = np.round(rec["ip2"][i]).astype(int).copy()
        s.image_diameter_start = float(rec["iw1"][i])
        s.image_diameter_end = float(rec["iw2"][i])
        s.max_width = int(rec["max_width"][i])
        s.length = int(rec["length"][i])
        s.ratio = float(rec["ratio"][i])
        s.drop_type = ref.bw.DropType(int(rec["drop_type"][i]))
        streaks.append(s)
    return streaks


def _run_reference(ref, bg_rgb, depth, rec, tex_choice, textures,
                   monkeypatch):
    """One frame through the real reference pipeline. Returns
    (rainy_rgb, mask, sat_rgb, env_rgb, fogged_rgb)."""
    bw, gen = ref.bw, ref.gen
    bg_bgr = bg_rgb[..., ::-1].astype(np.float64)

    # Real fog (FogRain defaults: angle 90, gain 20 — generator.py:232).
    fog = ref.add_attenuation.FogRain(
        rain_intensity=100.0, focal=FOCAL_M, f_number=6.0, angle=90,
        exposure=EXPOSURE_S * 1e3, camera_gain=20)
    fogged_bgr = fog.fog_rain_layer(bg_bgr, depth.astype(np.float64))

    # Real envmap + photometric tables (generator.py:400-410).
    map_generator = bw.EnvironmentMapGenerator(FOCAL_M, W, H)
    env_bgr = map_generator.generate_map(fogged_bgr)
    env_xyY = ref.my_utils.convert_rgb_to_xyY(env_bgr[..., ::-1])
    env_xyY[np.isnan(env_xyY)] = 0
    sa_map = ref.solid_angle.get_solid_angles(env_bgr)

    # add_drop_to_image reads db.settings(dataset)["cam_exposure"];
    # pin it to the reference's default (2 ms) without the config
    # import machinery.
    monkeypatch.setattr(bw.db, "settings",
                        lambda dataset: {"cam_exposure": EXPOSURE_S * 1e3})

    # Deterministic texture pick: same fixed choice as the other parity
    # tests (take_drop_texture is random; we bypass the randint only).
    tex_iter = iter(tex_choice)
    dbm = bw.DBManager()
    monkeypatch.setattr(
        dbm, "take_drop_texture",
        lambda drop: np.repeat(
            textures[next(tex_iter)][..., None], 3, -1).astype(np.float64))

    g = gen.Generator.__new__(gen.Generator)
    g.dataset = "kitti"
    g.irrad_type = "ambient"
    g.rendering_strategy = None
    g.opacity_attenuation = 1.0
    g.noise_scale = 0.0
    g.noise_std = 0.0
    g.db = dbm
    g.renderer = bw.RainRenderer(focal=FOCAL_M, f_number=6.0,
                                 focus_plane=6, radius=10, fov=165)
    g.fov_comp = bw.FovComputation(camera=np.array([0, 0, 0]))
    g.BGR_env_map = env_bgr
    g.env_map_xyY = env_xyY
    g.solid_angle_map = sa_map

    rainy_bgr = fogged_bgr.astype(np.float64).copy()
    mask = np.zeros((H, W), np.float64)
    sat_bgr = np.zeros((H, W, 3), np.float64)
    np.random.seed(0)
    for drop_dict in _make_streaks(ref, rec):
        rainy_bgr, mask, sat_bgr, _drop, blended, _minc = g.compute_drop(
            bg_bgr, drop_dict, rainy_bgr, mask, sat_bgr)
        assert blended is not None, \
            f"reference skipped drop {drop_dict.pid} (erroneous drop)"

    # mean-contrast adjust (generator.py:461-464)
    rainy_bgr = np.clip(rainy_bgr - (rainy_bgr.mean() - bg_bgr.mean()),
                        0, 1)
    return (rainy_bgr[..., ::-1], mask, sat_bgr[..., ::-1],
            env_bgr[..., ::-1], fogged_bgr[..., ::-1])


def _mask_metrics(got_mask, ref_mask, got_img, ref_img):
    import cv2

    gm, rm = got_mask > 0.03, ref_mask > 0.03
    union = max((gm | rm).sum(), 1)
    k = np.ones((3, 3), np.uint8)
    gd = cv2.dilate(gm.astype(np.uint8), k) > 0
    rd = cv2.dilate(rm.astype(np.uint8), k) > 0
    return {
        "iou": (gm & rm).sum() / union,
        "iou_tol": ((gm & rd) | (rm & gd)).sum() / union,
        "corr": np.corrcoef(got_mask.ravel(), ref_mask.ravel())[0, 1],
        "img_diff": float(np.abs(got_img - ref_img).mean()),
        "mass": got_mask.sum() / max(ref_mask.sum(), 1e-9),
        "rain_px": int(union),
    }


@pytest.fixture(scope="module")
def reference_render(ref, scene):
    """Run the real reference once (module-scoped; ~8 s)."""
    from raintpu.data.textures import procedural_streak_database

    bg, depth, rec = scene
    db = procedural_streak_database()
    n = len(rec["ip1"])
    tex_choice = (np.arange(n) * 7) % db.textures.shape[0]
    mp = pytest.MonkeyPatch()
    try:
        out = _run_reference(ref, bg, depth, rec, tex_choice,
                             db.textures.astype(np.float64), mp)
    finally:
        mp.undo()
    return out + (db, tex_choice)


def test_envmap_matches_reference_code(reference_render, scene):
    """raintpu's inverse-gather envmap vs the real scatter+fill+mirror
    EnvironmentMapGenerator.generate_map on the same fogged frame."""
    import jax.numpy as jnp
    from raintpu.ops.envmap import envmap_geometry, generate_envmap

    _, _, _, env_ref, fogged_ref = reference_render[:5]
    geom = envmap_geometry(H, W, FOCAL_M * 1000)
    env_got = np.asarray(generate_envmap(
        jnp.asarray(fogged_ref, jnp.float32), geom))
    assert env_got.shape == env_ref.shape, \
        (env_got.shape, env_ref.shape)
    diff = np.abs(env_got - env_ref).mean()
    # The reference leaves sparsity holes where its forward scatter maps
    # no source pixel (filled by the 15x15 feather); the inverse gather
    # has no holes. Mean difference stays small.
    assert diff < 0.03, diff
    corr = np.corrcoef(env_got.mean(-1).ravel(),
                       env_ref.mean(-1).ravel())[0, 1]
    assert corr > 0.98, corr


def test_fog_matches_reference_code(reference_render, scene):
    """raintpu's banded-matmul fog vs the real FogRain."""
    import jax.numpy as jnp
    from raintpu.ops.fog import fog_rain_layer

    bg, depth, _ = scene
    _, _, _, _, fogged_ref = reference_render[:5]
    fogged_got = np.asarray(fog_rain_layer(
        jnp.asarray(bg), jnp.asarray(depth), rain_intensity=100.0,
        f_number=6.0, exposure_s=EXPOSURE_S, camera_gain=20.0))
    assert np.abs(fogged_got - fogged_ref).mean() < 5e-3


def test_oracle_matches_reference_code(reference_render, scene):
    """tests/ref_numpy oracle vs the real reference code — validates
    the oracle the golden parity suite is built on."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "ref_numpy"))
    from reference_renderer import render_reference

    bg, depth, rec = scene
    ref_img, ref_mask, ref_sat, _env, fogged_ref, db, tex_choice = \
        reference_render
    or_img, or_mask, or_sat = render_reference(
        bg.astype(np.float64), fogged_ref.astype(np.float64), rec,
        db.textures.astype(np.float64), tex_choice,
        exposure_s=EXPOSURE_S, focal_m=FOCAL_M)
    m = _mask_metrics(or_mask, ref_mask, or_img, ref_img)
    print("oracle vs reference-code:", m)
    assert m["rain_px"] > 100
    # Both are CPU sequential renders with cv2 warps; the only
    # differences are the envmap source (oracle uses raintpu's) and the
    # pole-wrap polygon handling. Near-exact agreement expected.
    assert m["iou"] >= 0.95, m
    assert m["iou_tol"] >= 0.99, m
    assert m["corr"] >= 0.99, m
    assert m["img_diff"] < 5e-3, m
    assert 0.95 < m["mass"] < 1.05, m
    assert np.abs(or_sat - ref_sat).mean() < 0.01


def test_raintpu_matches_reference_code(reference_render, scene,
                                        monkeypatch):
    """raintpu's analytic TPU renderer vs the real reference code —
    the strongest parity claim available in this environment."""
    import jax
    import jax.numpy as jnp
    from raintpu.data.textures import texture_bank
    from raintpu.ops import rasterize as raster_ops
    from raintpu.particles.schema import pack_drop_batch
    from raintpu.render.camera import CameraSettings, RenderSettings
    from raintpu.render.frame import PipelineConfig, render_frame

    bg, depth, rec = scene
    ref_img, ref_mask, ref_sat, _env, _fogged, db, tex_choice = \
        reference_render
    bank = texture_bank(db)
    n = len(rec["ip1"])

    def fixed_select(drops, edges, key, offset=0):
        full = np.zeros(drops.ratio.shape[0], np.int32)
        full[:n] = tex_choice
        return jnp.asarray(full)

    monkeypatch.setattr(raster_ops, "select_textures", fixed_select)

    settings = RenderSettings(camera=CameraSettings(wh=(W, H),
                                                    ccd_wh=(W, H)))
    # radius 24: the close scene's defocus reaches 4*sigma = 18.1 —
    # a 16 rung would clip sigma and truncate the blur spill (measured
    # as a 0.958 tolerant-IoU vs the reference until widened).
    raster = raster_ops.RasterConfig(
        buckets=(raster_ops.BucketSpec(48, 32, 6, 64),
                 raster_ops.BucketSpec(128, 96, 24, 24)))
    cfg = PipelineConfig(settings=settings, image_hw=(H, W),
                         fallrate=100.0, raster=raster, env_downsample=2,
                         compute_saturation_mask=True)
    out = render_frame(jnp.asarray(bg), jnp.asarray(depth),
                       pack_drop_batch(rec, 64), bank,
                       jnp.asarray(db.bin_edges), jax.random.PRNGKey(0),
                       cfg)
    got_img = np.asarray(out.rainy_image)
    got_mask = np.asarray(out.rain_mask)
    got_sat = np.asarray(out.saturation_mask)

    m = _mask_metrics(got_mask, ref_mask, got_img, ref_img)
    print("raintpu vs reference-code:", m)
    assert m["rain_px"] > 100
    # Round-4 bars (canvas-clip band + modal blur): measured base
    # 0.968 / close 0.940 strict, both 1.0 tolerant, mass within 0.2%.
    assert m["iou"] >= 0.92, m
    assert m["iou_tol"] >= 0.995, m
    assert m["corr"] >= 0.99, m
    assert m["img_diff"] < 0.01, m
    assert 0.95 < m["mass"] < 1.05, m
    assert np.abs(got_sat - ref_sat).mean() < 0.02

    # Strict-IoU decomposition (round-3 registration scan, BASELINE.md):
    # the IoU-vs-subpixel-offset surface peaks exactly at (0,0) and the
    # disagreement is confined to the 1-px edge band (sub-pixel AA
    # rounding on 1-2 px streak perimeters). Pin the INTERIOR
    # disagreement: a registration or shape regression shows up here
    # immediately, where the scalar IoU would only drift. Round 4
    # (canvas-clip band + modal blur) reduced the measured residual to
    # ZERO interior px on both scenes (was 1 base / 6 close); budget 2
    # allows threshold-straddle dust, and no interior pixel may be
    # MATERIALLY wrong (off by more than the mask threshold itself).
    import cv2

    k = np.ones((3, 3), np.uint8)
    gm, rm = got_mask > 0.03, ref_mask > 0.03
    rd = cv2.dilate(rm.astype(np.uint8), k) > 0
    gd = cv2.dilate(gm.astype(np.uint8), k) > 0
    interior = (gm & ~rm & ~rd) | (rm & ~gm & ~gd)
    n_interior = int(interior.sum())
    strong = interior & (np.abs(got_mask - ref_mask) > 0.03)
    assert n_interior <= 2, f"{n_interior} interior-disagreement px"
    assert strong.sum() == 0, \
        (f"{strong.sum()} materially-wrong interior px "
         f"(max |diff| {np.abs(got_mask - ref_mask)[interior].max():.4f})")


def test_xml_parser_matches_reference_parser(ref, tmp_path):
    """Parse ONE reference-format XML with the real
    DBManager.load_streaks_from_xml AND raintpu's loader; every parsed
    field must agree drop-for-drop (render_scale=2 exercises the
    scaling path too)."""
    import os as _os

    rng = np.random.RandomState(3)
    n_frames, n_drops = 3, 12
    lines = ["<simulation>"]
    for f in range(n_frames):
        lines.append(f'<frame id="{f}" t="2000" d="{f * 100000}" '
                     f'rs="{n_drops}">')
        for i in range(n_drops):
            x, y = rng.uniform(5, 300, 2)
            ln = rng.uniform(2, 40)
            w_d = rng.uniform(0.4, 9)
            z = rng.uniform(0.3, 8)
            lines.append(
                f'<drop pid="{i}" wp1="({x/100:.4f};{1.0:.4f};{-z:.4f})" '
                f'wp2="({x/100:.4f};{0.98:.4f};{-z:.4f})" '
                f'wd1="0.002" wd2="0.0019" '
                f'ip1="({x:.3f};{y + ln:.3f})" ip2="({x:.3f};{y:.3f})" '
                f'iw1="{w_d:.3f}" iw2="{w_d * 0.9:.3f}"/>')
        lines.append("</frame>")
    lines.append("</simulation>")
    path = _os.path.join(str(tmp_path), "0000_camera0.xml")
    with open(path, "w") as fh:
        fh.write("\n".join(lines))

    img_wh = (160, 120)
    scale = 2.0

    # Real reference parser.
    dbm = ref.bw.DBManager(streaks_path_xml=path)
    dbm.load_streaks_from_xml("kitti", {"render_scale": scale},
                              list(img_wh), use_pickle=False,
                              verbose=False)

    # raintpu parser.
    from raintpu.particles import xml_io

    # cull=False: compare the PARSE stage exactly — the reference
    # applies its in-frame cull later, in the generator frame loop.
    got = xml_io.load_streaks(path, image_wh=img_wh, use_cache=False,
                              render_scale=scale, cull=False)

    assert sorted(got) == sorted(dbm.streaks_simulator)
    for fid, frame in dbm.streaks_simulator.items():
        rec = got[fid]
        streaks = list(frame.streaks.values())   # file order
        assert len(rec["ip1"]) == len(streaks), fid
        for i, s in enumerate(streaks):
            np.testing.assert_array_equal(
                rec["ip1"][i], s.image_position_start, err_msg="ip1")
            np.testing.assert_array_equal(
                rec["ip2"][i], s.image_position_end, err_msg="ip2")
            np.testing.assert_allclose(
                rec["iw1"][i], s.image_diameter_start, rtol=1e-6)
            np.testing.assert_allclose(
                rec["iw2"][i], s.image_diameter_end, rtol=1e-6)
            np.testing.assert_allclose(
                rec["wp1"][i], s.world_position_start, rtol=1e-6)
            np.testing.assert_allclose(
                rec["wp2"][i], s.world_position_end, rtol=1e-6)
            assert rec["max_width"][i] == s.max_width
            assert rec["length"][i] == s.length
            assert rec["drop_type"][i] == s.drop_type.value
            np.testing.assert_allclose(rec["ratio"][i], s.ratio,
                                       rtol=1e-5)
