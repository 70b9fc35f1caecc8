import os

import numpy as np
import jax

from raintpu.particles import xml_io
from raintpu.particles.schema import pack_drop_batch
from raintpu.physics.simulator import SimConfig, simulate_frames
import jax.numpy as jnp


def _synthetic_xml(tmp_path, n_frames=3, n_drops=5):
    """Hand-write a reference-format XML file."""
    lines = ["<simulation>"]
    rng = np.random.RandomState(0)
    for f in range(n_frames):
        lines.append(f'<frame id="{f}" t="2000" d="{f * 100000}" rs="{n_drops}">')
        for i in range(n_drops):
            x, y = rng.uniform(10, 200), rng.uniform(10, 100)
            ln = rng.uniform(3, 20)
            w = rng.uniform(1.2, 5)
            z = rng.uniform(0.5, 5)
            lines.append(
                f'<drop pid="{i}" wp1="({x/100:.3f};{1.0:.3f};{-z:.3f})" '
                f'wp2="({x/100:.3f};{0.98:.3f};{-z:.3f})" '
                f'wd1="0.002" wd2="0.002" '
                f'ip1="({x:.2f};{y + ln:.2f})" ip2="({x:.2f};{y:.2f})" '
                f'iw1="{w:.2f}" iw2="{w * 0.9:.2f}"/>')
        lines.append("</frame>")
    lines.append("</simulation>")
    p = os.path.join(tmp_path, "0000_camera0.xml")
    with open(p, "w") as fh:
        fh.write("\n".join(lines))
    return p


def test_parse_and_finalize(tmp_path):
    p = _synthetic_xml(str(tmp_path))
    streaks = xml_io.load_streaks(p, image_wh=(256, 128), use_cache=False)
    assert sorted(streaks) == [0, 1, 2]
    rec = streaks[0]
    assert len(rec["ip1"]) > 0
    # y must be flipped: sim y in [10, 120] -> image y = 128 - y.
    assert np.all(rec["ip1"][:, 1] <= 118)
    # z negated positive.
    assert np.all(rec["wp1"][:, 2] > 0)
    assert np.all(rec["max_width"] >= 1)


def test_empty_frames_both_parsers(tmp_path):
    """Self-closing zero-drop frames (<frame ... />) must not swallow
    the next frame's drops (native-parser regression: it searched for a
    </frame> that a self-closing frame doesn't have)."""
    p = os.path.join(str(tmp_path), "0000_camera0.xml")
    with open(p, "w") as fh:
        fh.write(
            '<simulation>'
            '<frame id="0" t="2000" d="0" rs="0" />'
            '<frame id="1" t="2000" d="100" rs="1">'
            '<drop pid="7" wp1="(0.1;1.0;-2.0)" wp2="(0.1;0.98;-2.0)" '
            'wd1="0.002" wd2="0.002" ip1="(50;40)" ip2="(50;30)" '
            'iw1="2.0" iw2="1.8"/></frame>'
            '<frame id="2" t="2000" d="200" rs="0"></frame>'
            '<frame id="3" t="2000" d="300" rs="1">'
            '<drop pid="9" wp1="(0.2;1.0;-3.0)" wp2="(0.2;0.98;-3.0)" '
            'wd1="0.002" wd2="0.002" ip1="(80;70)" ip2="(80;60)" '
            'iw1="3.0" iw2="2.7"/></frame>'
            '</simulation>')
    for prefer_native in (False, True):
        frames = xml_io.parse_particles_xml_raw(
            p, prefer_native=prefer_native)
        label = "native" if prefer_native else "python"
        assert [f["id"] for f in frames] == [0, 1, 2, 3], label
        assert [len(f["ip1"]) for f in frames] == [0, 1, 0, 1], label
        assert frames[1]["pid"][0] == 7, label
        assert frames[3]["pid"][0] == 9, label
        assert frames[3]["start"] == 300, label


def test_cache_roundtrip(tmp_path):
    p = _synthetic_xml(str(tmp_path))
    a = xml_io.load_streaks(p, image_wh=(256, 128), use_cache=True)
    assert os.path.exists(p + ".npz")
    b = xml_io.load_streaks(p, image_wh=(256, 128), use_cache=True)
    for k in a[0]:
        np.testing.assert_array_equal(a[0][k], b[0][k])
    # Cache keyed on image shape: different shape -> regenerated, still ok.
    c = xml_io.load_streaks(p, image_wh=(512, 256), use_cache=True)
    assert np.all(c[0]["ip1"][:, 1] != a[0]["ip1"][:, 1])


def test_render_scale_division(tmp_path):
    p = _synthetic_xml(str(tmp_path))
    full = xml_io.load_streaks(p, image_wh=(256, 128), render_scale=1,
                               use_cache=False)
    half = xml_io.load_streaks(p, image_wh=(128, 64), render_scale=2,
                               use_cache=False)
    # Positions scale by ~1/2 (before rounding).
    f = full[0]["ip1"][:, 0]
    hh = half[0]["ip1"][:, 0]
    assert len(hh) <= len(f)
    if len(hh):
        assert hh.max() <= f.max() / 2 + 1


def test_corrupted_xml_raises(tmp_path):
    p = os.path.join(str(tmp_path), "bad_camera0.xml")
    with open(p, "w") as fh:
        fh.write("<simulation><frame id=")
    try:
        xml_io.parse_particles_xml_raw(p)
        assert False, "should raise"
    except RuntimeError as e:
        assert "corrupted" in str(e)


def test_simulator_xml_roundtrip(tmp_path):
    """Simulate on device -> export XML -> re-load -> identical streaks."""
    cfg = SimConfig(image_wh=(256, 128), focal_px=(300.0, 300.0),
                    exposure_s=2e-3, capacity=256, z_max=10.0)
    batch = simulate_frames(jax.random.PRNGKey(0), cfg,
                            jnp.full(2, 20.0), jnp.zeros(2),
                            jnp.full(2, 2e-3), jnp.ones(2))
    raw = xml_io.batch_to_raw_frames(batch, (256, 128), cam_hz=10.0,
                                     exposure_s=2e-3)
    p = os.path.join(str(tmp_path), "sim_camera0.xml")
    xml_io.write_particles_xml(p, raw)

    loaded = xml_io.load_streaks(p, image_wh=(256, 128), use_cache=False)
    v0 = np.asarray(batch.valid[0])
    got = loaded[0]
    assert len(got["ip1"]) == v0.sum()
    # Compare sorted streak endpoints (order may differ after culling).
    a = np.sort(np.asarray(batch.ip1[0])[v0], axis=0)
    b = np.sort(got["ip1"], axis=0)
    np.testing.assert_allclose(a, b, atol=1e-3)
    np.testing.assert_allclose(
        np.sort(np.asarray(batch.iw1[0])[v0]), np.sort(got["iw1"]),
        rtol=1e-4)
    np.testing.assert_allclose(
        np.sort(np.asarray(batch.wp1[0])[v0][:, 2]),
        np.sort(got["wp1"][:, 2]), atol=1e-4)


def test_pack_batch_capacity_overflow():
    rec = {
        "ip1": np.random.rand(10, 2).astype(np.float32),
        "ip2": np.random.rand(10, 2).astype(np.float32),
        "iw1": np.random.rand(10).astype(np.float32),
        "iw2": np.random.rand(10).astype(np.float32),
        "wp1": np.random.rand(10, 3).astype(np.float32),
        "wp2": np.random.rand(10, 3).astype(np.float32),
        "max_width": np.arange(10, 0, -1).astype(np.int32),
        "length": np.full(10, 5, np.int32),
        "ratio": np.random.rand(10).astype(np.float32),
        "drop_type": np.zeros(10, np.int32),
    }
    b = pack_drop_batch(rec, capacity=4)
    assert int(b.count()) == 4
    # Widest drops kept.
    assert np.asarray(b.max_width)[:4].tolist() == [10, 9, 8, 7]


def test_native_parser_matches_python(tmp_path):
    from raintpu.particles.native import available, parse_particles_xml_native

    if not available():
        import pytest
        pytest.skip("native parser not built")
    p = _synthetic_xml(str(tmp_path), n_frames=4, n_drops=20)
    a = xml_io.parse_particles_xml_raw(p, prefer_native=False)
    b = parse_particles_xml_native(p)
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        # exposure/start exercise attribute-name disambiguation: frame
        # attr `d` must not match inside `id="..."`.
        for k in ("id", "exposure", "start", "count"):
            assert fa[k] == fb[k], k
        for k in ("ip1", "ip2", "iw1", "iw2", "wp1", "wp2", "pid",
                  "wd1", "wd2"):
            np.testing.assert_allclose(fa[k], fb[k], rtol=1e-6)
    # Regression for the d-inside-id bug: frame 3 has d = 300000.
    assert b[3]["start"] == 300000 and b[3]["id"] == 3


def test_roundtrip_render_scale_2(tmp_path):
    """Export at render_scale=2 -> reload at render_scale=2 -> identical
    streak positions (regression for the double-applied scale in the
    y-unflip)."""
    from raintpu.physics.simulator import SimConfig, simulate_frames

    cfg = SimConfig(image_wh=(256, 128), focal_px=(600.0, 600.0),
                    exposure_s=2e-3, capacity=256, z_max=5.0,
                    render_scale=2.0)
    batch = simulate_frames(jax.random.PRNGKey(0), cfg,
                            jnp.full(1, 80.0), jnp.zeros(1),
                            jnp.full(1, 2e-3), jnp.ones(1))
    raw = xml_io.batch_to_raw_frames(batch, cfg.image_wh, cam_hz=10.0,
                                     exposure_s=2e-3, render_scale=2.0,
                                     focal_px=300.0)
    p = os.path.join(str(tmp_path), "rs2_camera0.xml")
    xml_io.write_particles_xml(p, raw)
    # Reload at the same render_scale: image_wh here is the RENDER size.
    loaded = xml_io.load_streaks(p, image_wh=(128, 64), render_scale=2.0,
                                 use_cache=False)
    v0 = np.asarray(batch.valid[0])
    got = loaded[0]
    assert len(got["ip1"]) == v0.sum() > 0
    a = np.sort(np.asarray(batch.ip1[0])[v0], axis=0)
    b = np.sort(got["ip1"], axis=0)
    np.testing.assert_allclose(a, b, atol=1e-3)
    # World diameters survive the round trip (native + python parsers).
    raw2 = xml_io.parse_particles_xml_raw(p)
    np.testing.assert_allclose(np.sort(raw2[0]["wd1"]),
                               np.sort(raw[0]["wd1"]), rtol=1e-4)
    assert np.all(raw2[0]["wd1"] > 0)
