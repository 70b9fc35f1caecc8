import numpy as np
import jax
import jax.numpy as jnp

from raintpu.physics import dsd
from raintpu.physics.simulator import (SimConfig, expected_drop_count,
                                       schedule_from_settings,
                                       simulate_frame, simulate_frames)
from raintpu.render.camera import RenderSettings, CameraSettings, SimSettings


def kitti_cfg(capacity=2048):
    return SimConfig(image_wh=(1242, 375), focal_px=(1290.3, 1290.3),
                     exposure_s=2e-3, capacity=capacity)


def test_mp_distribution_basics():
    lam10 = float(dsd.mp_lambda(10.0))
    assert np.isclose(lam10, 4.1 * 10 ** -0.21, rtol=1e-5)
    # Heavier rain -> flatter spectrum -> more big drops.
    c_small = float(dsd.concentration_above(1.0, 5.0))
    c_heavy = float(dsd.concentration_above(1.0, 50.0))
    assert c_heavy > c_small
    # Terminal velocity increases with size and saturates < 9.65.
    v = np.asarray(dsd.terminal_velocity(jnp.asarray([0.5, 2.0, 5.0])))
    assert v[0] < v[1] < v[2] < 9.65


def test_expected_count_increases_with_fallrate():
    cfg = kitti_cfg()
    e5 = expected_drop_count(cfg, 5.0)
    e50 = expected_drop_count(cfg, 50.0)
    assert 0 < e5 < e50
    # Sanity: order hundreds to few thousands for KITTI geometry.
    assert 10 < e5 < 20000, e5


def test_simulated_count_matches_expectation():
    cfg = kitti_cfg(capacity=4096)
    e = expected_drop_count(cfg, 10.0)
    counts = []
    for s in range(8):
        b = simulate_frame(jax.random.PRNGKey(s), cfg, 10.0, 0.0, 2e-3, 1.0)
        counts.append(int(b.count()))
    mean = np.mean(counts)
    # The sampler draws in a padded frustum (pad^2 ~ 1.69x area) and the
    # in-frame/degenerate culls then trim; realized count must sit in
    # [0.3, 1.05] of the raw sampling rate.
    assert e * 0.3 < mean <= e * 1.05, (mean, e)


def test_drops_fall_downward_in_image():
    cfg = kitti_cfg()
    b = simulate_frame(jax.random.PRNGKey(0), cfg, 20.0, 0.0, 2e-3, 1.0)
    v = np.asarray(b.valid)
    dy = np.asarray(b.ip2[:, 1] - b.ip1[:, 1])[v]
    # Image y grows downward; falling drops have end below start.
    assert (dy >= 0).mean() > 0.99


def test_camera_motion_lengthens_streaks():
    cfg = kitti_cfg()
    slow = simulate_frame(jax.random.PRNGKey(1), cfg, 20.0, 0.0, 2e-3, 1.0)
    fast = simulate_frame(jax.random.PRNGKey(1), cfg, 20.0, 25.0, 2e-3, 1.0)

    def mean_len(b):
        v = np.asarray(b.valid)
        return np.asarray(b.length)[v].mean()

    assert mean_len(fast) > mean_len(slow)


def test_longer_exposure_lengthens_streaks():
    cfg = kitti_cfg()
    short = simulate_frame(jax.random.PRNGKey(2), cfg, 20.0, 0.0, 1e-3, 1.0)
    long_ = simulate_frame(jax.random.PRNGKey(2), cfg, 20.0, 0.0, 5e-3, 1.0)
    v1, v2 = np.asarray(short.valid), np.asarray(long_.valid)
    assert np.asarray(long_.length)[v2].mean() > \
        np.asarray(short.length)[v1].mean()


def test_fields_finite_and_in_schema(rng):
    cfg = kitti_cfg()
    b = simulate_frame(jax.random.PRNGKey(3), cfg, 50.0, 10.0, 2e-3, 1.0)
    for name in ["ip1", "ip2", "iw1", "iw2", "wp1", "wp2", "ratio"]:
        assert np.all(np.isfinite(np.asarray(getattr(b, name)))), name
    v = np.asarray(b.valid)
    assert np.all(np.asarray(b.max_width)[v] >= 1)
    assert np.all(np.asarray(b.length)[v] >= 1)
    assert np.all(np.asarray(b.wp1)[v][:, 2] > 0)  # parsed z positive


def test_steps_schedule():
    st = RenderSettings(
        camera=CameraSettings(),
        sim=SimSettings(mode="steps", steps=(
            ("cam_motion", (72.0, 36.0, 0.0)),
            ("rain_fallrate", (5.0, 10.0)),
        )))
    fall, speed, expo, fscale = schedule_from_settings(st, fallrate=25.0)
    assert fall.shape == (3,)
    np.testing.assert_allclose(np.asarray(speed), [20.0, 10.0, 0.0])
    # Shorter schedules persist their last value.
    np.testing.assert_allclose(np.asarray(fall), [5.0, 10.0, 10.0])
    np.testing.assert_allclose(np.asarray(expo), 2e-3)
    np.testing.assert_allclose(np.asarray(fscale), 1.0)


def test_normal_mode_frame_count():
    st = RenderSettings(camera=CameraSettings(),
                        sim=SimSettings(mode="normal", duration=3.0))
    fall, speed, expo, fscale = schedule_from_settings(st, fallrate=25.0)
    assert fall.shape == (30,)  # 3 s * 10 Hz
    np.testing.assert_allclose(np.asarray(fall), 25.0)


def test_simulate_frames_batched():
    cfg = kitti_cfg(capacity=512)
    fall = jnp.asarray([5.0, 25.0, 100.0])
    speed = jnp.zeros(3)
    expo = jnp.full(3, 2e-3)
    fs = jnp.ones(3)
    b = simulate_frames(jax.random.PRNGKey(0), cfg, fall, speed, expo, fs)
    assert b.ip1.shape == (3, 512, 2)
    counts = np.asarray(b.count())
    assert counts[0] < counts[2]  # heavier rain, more streaks


def test_compact_drop_batch():
    from raintpu.particles.schema import compact_drop_batch

    cfg = kitti_cfg(capacity=512)
    b = simulate_frame(jax.random.PRNGKey(4), cfg, 5.0, 5.0, 2e-3, 1.0)
    n_before = int(b.count())
    assert 0 < n_before < 256  # no truncation in this scenario
    c = compact_drop_batch(b, 256)
    assert int(c.count()) == n_before
    v = np.asarray(c.valid)
    # Valid drops packed to the front.
    assert v[:n_before].all() and not v[n_before:].any()
    # Same drop population (compare sorted widths).
    wb = np.sort(np.asarray(b.iw1)[np.asarray(b.valid)])
    wc = np.sort(np.asarray(c.iw1)[v])
    np.testing.assert_allclose(wb, wc)
