"""Rain microphysics: drop-size distribution and terminal velocity.

The reference's particle simulator is an opaque prebuilt C++ binary
(``AHLSimulation``, 3rdparty/weather-particle-simulator; source absent —
SURVEY.md C13a). Its observable physics — a fall-rate-controlled drop
population falling at terminal velocity past a moving camera — is
rebuilt here from the standard published models:

- Marshall & Palmer (1948): N(D) = N0 * exp(-Lambda * D) with
  N0 = 8000 m^-3 mm^-1 and Lambda = 4.1 * R^-0.21 mm^-1 for fall rate
  R in mm/hr.
- Atlas et al. (1973) terminal velocity fit:
  v(D) = 9.65 - 10.3 * exp(-0.6 * D) m/s (D in mm), clamped at >= 0.

All functions are pure JAX, usable inside jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

MP_N0 = 8000.0          # m^-3 mm^-1
DROP_D_MAX_MM = 6.0     # breakup limit — larger drops are unstable


def mp_lambda(rain_rate_mm_hr) -> jnp.ndarray:
    """Marshall-Palmer slope Lambda (mm^-1) for fall rate R (mm/hr)."""
    r = jnp.maximum(jnp.asarray(rain_rate_mm_hr, jnp.float32), 1e-3)
    return 4.1 * r ** (-0.21)


def concentration_above(d_mm, rain_rate_mm_hr) -> jnp.ndarray:
    """Number of drops per m^3 with diameter >= d_mm:
    integral of N(D) = N0/Lambda * exp(-Lambda * d)."""
    lam = mp_lambda(rain_rate_mm_hr)
    return MP_N0 / lam * jnp.exp(-lam * jnp.asarray(d_mm, jnp.float32))


def sample_diameter_above(u, d_min_mm, rain_rate_mm_hr) -> jnp.ndarray:
    """Inverse-CDF sample of D | D >= d_min (memoryless exponential):
    D = d_min - ln(u)/Lambda, clamped at the breakup limit. u in (0, 1]."""
    lam = mp_lambda(rain_rate_mm_hr)
    d = d_min_mm - jnp.log(jnp.maximum(u, 1e-12)) / lam
    return jnp.minimum(d, DROP_D_MAX_MM)


def terminal_velocity(d_mm) -> jnp.ndarray:
    """Terminal fall speed (m/s) for diameter D (mm), Atlas 1973."""
    return jnp.maximum(9.65 - 10.3 * jnp.exp(-0.6 * jnp.asarray(d_mm)), 0.0)
