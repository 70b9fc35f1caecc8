"""External anchors for the on-device simulator's physics.

Round-2 VERDICT item 7: test_simulator.py checks internal consistency
(realized counts vs the module's own expectation); nothing pinned the
ABSOLUTE population to anything outside the module. These tests anchor
physics/dsd.py and the simulator's visible-population integral to
published, independently re-derived values, so a distribution change
cannot pass silently:

1. Gunn & Kinzer (1949) measured terminal velocities — the data the
   Atlas et al. (1973) fit approximates (within ~2%).
2. Marshall-Palmer closed loop: integrating the water flux
   (pi/6) D^3 v(D) N(D) over the spectrum must recover the fall rate
   the spectrum was parameterized by (the MP fit is self-consistent to
   ~5-20% — a well-known property; a wrong N0/Lambda/velocity breaks
   this immediately).
3. MP liquid water content W = 72 R^0.88 mg/m^3 (Marshall & Palmer
   1948, eq. 4's companion relation) within fit accuracy.
4. The simulator's expected visible-streak count against a from-scratch
   numpy re-integration of (frustum area x depth slab x concentration
   above the visibility diameter) — same model, independent code.
"""

import numpy as np
import jax.numpy as jnp

from raintpu.physics import dsd
from raintpu.physics.simulator import SimConfig, expected_drop_count

# Gunn & Kinzer (1949), Table 2 (sea level): diameter mm -> m/s.
GUNN_KINZER = {1.0: 4.03, 2.0: 6.49, 3.0: 8.06, 4.0: 8.83, 5.0: 9.09}


def test_terminal_velocity_matches_gunn_kinzer():
    for d_mm, v_meas in GUNN_KINZER.items():
        v = float(dsd.terminal_velocity(d_mm))
        assert abs(v - v_meas) / v_meas < 0.025, (d_mm, v, v_meas)


def test_marshall_palmer_closed_loop_rainrate():
    """N(D; R) integrated against v(D) must give back ~R (mm/hr)."""
    d = np.linspace(1e-4, 10.0, 100001)                      # mm
    v = np.asarray(dsd.terminal_velocity(jnp.asarray(d)))    # m/s
    for rate in (1.0, 5.0, 25.0, 100.0):
        lam = float(dsd.mp_lambda(rate))                     # mm^-1
        n_d = dsd.MP_N0 * np.exp(-lam * d)                   # m^-3 mm^-1
        flux_m_s = np.trapezoid((np.pi / 6) * (d * 1e-3) ** 3 * n_d * v,
                                d)
        recovered = flux_m_s * 1000 * 3600                   # mm/hr
        # MP self-consistency: recovered/nominal ~ 1.05-1.18 over the
        # whole 1-100 mm/hr range (computed from the published
        # constants; drifts far outside iff the spectrum is wrong).
        assert 0.95 < recovered / rate < 1.25, (rate, recovered)


def test_marshall_palmer_liquid_water_content():
    """W = rho_w * int (pi/6) D^3 N(D) dD ~= 72 R^0.88 mg/m^3 (MP 1948).
    Closed form for the exponential spectrum: W = pi * rho * N0 /
    Lambda^4 (in consistent units)."""
    for rate in (1.0, 10.0, 50.0):
        lam = float(dsd.mp_lambda(rate))                     # mm^-1
        # mg/m^3: (pi/6) * N0 [m^-3 mm^-1] * Gamma(4)/lam^4 [mm^4]
        #         * 1e-9 [m^3/mm^3] * 1e9 [mg/m^3 per g/cm^3... rho=1]
        w_mg = (np.pi / 6) * dsd.MP_N0 * 6.0 / lam ** 4 * 1e-3 * 1e3
        w_fit = 72.0 * rate ** 0.88
        assert 0.75 < w_mg / w_fit < 1.35, (rate, w_mg, w_fit)


def test_visible_population_independent_integration():
    """simulator.expected_drop_count vs an independent numpy
    re-integration of the same physical model (padded-frustum area x
    concentration above the 1-px visibility diameter, over depth)."""
    w, h = 1242, 375
    fx = fy = 1290.3
    cfg = SimConfig(image_wh=(w, h), focal_px=(fx, fy), exposure_s=2e-3,
                    capacity=4096)
    for rate in (5.0, 25.0, 100.0):
        # From-scratch integration on a fine independent grid.
        z = np.linspace(cfg.z_min, cfg.z_max, 200001)
        pad = cfg.frustum_pad
        area = (w / fx * z * pad) * (h / fy * z * pad)       # m^2
        d_vis_mm = cfg.min_width_px * z / fx * 1000.0
        lam = 4.1 * rate ** -0.21
        conc = 8000.0 / lam * np.exp(-lam * d_vis_mm)        # m^-3
        expected = np.trapezoid(area * conc, z)
        got = expected_drop_count(cfg, rate)
        assert abs(got - expected) / expected < 0.02, \
            (rate, got, expected)


def test_heavier_rain_shifts_size_spectrum():
    """Median sampled diameter grows with fall rate (flatter Lambda) —
    pinned to the analytic conditional median d_min + ln(2)/Lambda."""
    u = np.linspace(0.001, 0.999, 4001)
    for rate in (2.0, 20.0, 200.0):
        d = np.asarray(dsd.sample_diameter_above(
            jnp.asarray(u), 0.5, rate))
        med = np.median(d)
        lam = float(dsd.mp_lambda(rate))
        assert abs(med - (0.5 + np.log(2) / lam)) < 0.02, (rate, med)
