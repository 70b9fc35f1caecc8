"""Pallas composite kernel vs the XLA scatter reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raintpu.ops.composite import FieldMaps, composite_drops
from raintpu.ops.pallas.composite_kernel import (composite_drops_pallas,
                                                 scatter_bucket_pallas)
from raintpu.ops.rasterize import RasterBucket


def _mk_bucket(rng, c=6, ph=16, pw=16, img_hw=(32, 48)):
    h, w = img_hw
    patches = (rng.rand(c, ph, pw) * 0.8).astype(np.float32)
    anchor = np.stack([rng.randint(0, w, c), rng.randint(0, h, c)],
                      -1).astype(np.int32)
    valid = np.ones(c, bool)
    valid[-1] = False
    return RasterBucket(
        patches=jnp.asarray(patches * valid[:, None, None]),
        anchor=jnp.asarray(anchor),
        drop_idx=jnp.asarray(np.arange(c, dtype=np.int32)),
        valid=jnp.asarray(valid),
        overflow=jnp.asarray(0, jnp.int32))


def test_pallas_scatter_matches_xla():
    rng = np.random.RandomState(0)
    img_hw = (32, 48)
    b = _mk_bucket(rng, img_hw=img_hw)
    n = 6
    lo = jnp.asarray(rng.rand(n).astype(np.float32) * 0.5)
    add = jnp.asarray(rng.rand(n, 3).astype(np.float32))

    ref = composite_drops(img_hw, [b], lo, add)
    got = composite_drops_pallas(img_hw, [b], lo, add, interpret=True)

    np.testing.assert_allclose(np.asarray(got.alpha),
                               np.asarray(ref.alpha), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.log_att),
                               np.asarray(ref.log_att), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.additive),
                               np.asarray(ref.additive), atol=1e-5)


def test_pallas_scatter_overlapping_drops():
    # All drops at the same anchor: accumulation must sum, not race.
    c, ph, pw = 5, 8, 8
    img_hw = (16, 24)
    patches = jnp.ones((c, ph, pw), jnp.float32) * 0.1
    anchor = jnp.full((c, 2), 3, jnp.int32)
    b = RasterBucket(patches=patches, anchor=anchor,
                     drop_idx=jnp.arange(c, dtype=jnp.int32),
                     valid=jnp.ones(c, bool),
                     overflow=jnp.asarray(0, jnp.int32))
    lo = jnp.full((c,), 0.2)
    add = jnp.ones((c, 3))
    got = composite_drops_pallas(img_hw, [b], lo, add, interpret=True)
    a = np.asarray(got.alpha)
    assert np.isclose(a[3, 3], 0.5, atol=1e-6)      # 5 x 0.1
    expected_log = 5 * np.log(1 - 0.1 * 0.2)
    assert np.isclose(np.asarray(got.log_att)[3, 3], expected_log,
                      atol=1e-5)
