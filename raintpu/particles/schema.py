"""Particle (streak) data schema: padded struct-of-arrays pytrees.

The reference keeps per-frame drops as a dict of ``Streak`` objects
(``common/bad_weather.py:46-75``) and loops over them in Python. The
TPU-native representation is a fixed-capacity struct-of-arrays with a
validity mask, so a whole frame's drops batch through vmapped kernels.

Field semantics match the post-parse state of the reference
(``bad_weather.py:200-239``):
- image positions are render-scaled, y-flipped (y_img = H - y_sim) and
  rounded to integers (stored as float32);
- world positions have the simulator z-axis negated;
- ``max_width`` = int(max(iw1, iw2)); ``length`` = ceil(|ip1 - ip2|)
  computed on the *rounded* positions; ``ratio`` = max_width / |ip1 - ip2|
  on the un-rounded positions;
- ``drop_type``: 0 = Big (w >= 4), 1 = Medium (w > 1), 2 = Small.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

TYPE_BIG = 0
TYPE_MEDIUM = 1
TYPE_SMALL = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DropBatch:
    """Fixed-capacity batch of streaks (one frame, or B frames if leading
    batch dims are added by vmap)."""

    ip1: jnp.ndarray        # (N, 2) float32 — rounded image pos start (x, y)
    ip2: jnp.ndarray        # (N, 2) float32 — rounded image pos end
    iw1: jnp.ndarray        # (N,) float32 — image diameter start (px)
    iw2: jnp.ndarray        # (N,) float32 — image diameter end (px)
    wp1: jnp.ndarray        # (N, 3) float32 — world pos start (z negated)
    wp2: jnp.ndarray        # (N, 3) float32 — world pos end
    max_width: jnp.ndarray  # (N,) int32
    length: jnp.ndarray     # (N,) int32
    ratio: jnp.ndarray      # (N,) float32
    drop_type: jnp.ndarray  # (N,) int32
    valid: jnp.ndarray      # (N,) bool

    @property
    def capacity(self) -> int:
        return self.ip1.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def empty_drop_batch(capacity: int) -> DropBatch:
    z2 = jnp.zeros((capacity, 2), jnp.float32)
    z3 = jnp.zeros((capacity, 3), jnp.float32)
    z1 = jnp.zeros((capacity,), jnp.float32)
    zi = jnp.zeros((capacity,), jnp.int32)
    return DropBatch(ip1=z2, ip2=z2, iw1=z1, iw2=z1, wp1=z3, wp2=z3,
                     max_width=zi, length=zi, ratio=z1,
                     drop_type=jnp.full((capacity,), TYPE_SMALL, jnp.int32),
                     valid=jnp.zeros((capacity,), bool))


def compact_drop_batch(drops: DropBatch, capacity: int) -> DropBatch:
    """Device-side compaction: pack valid drops to the front and trim to
    ``capacity`` (jittable; overflow drops beyond capacity are lost —
    callers should size capacity from the workload).

    The on-device simulator leaves invalid holes where culls hit; the
    render cost of the parameter-prep stage scales with the batch
    capacity, so tight packing matters at production rates.
    """
    import jax

    n = drops.valid.shape[-1]
    idx = jnp.where(drops.valid, jnp.arange(n, dtype=jnp.int32), n)
    idx = jnp.sort(idx)
    if capacity > n:
        idx = jnp.pad(idx, (0, capacity - n), constant_values=n)
    idx = idx[:capacity]
    sel_valid = idx < n
    idx = jnp.minimum(idx, n - 1)

    def take(a):
        return a[idx]

    out = jax.tree.map(take, drops)
    return dataclasses.replace(out, valid=sel_valid)


def finalize_raw_streaks(ip1: np.ndarray, ip2: np.ndarray,
                         iw1: np.ndarray, iw2: np.ndarray,
                         wp1: np.ndarray, wp2: np.ndarray,
                         image_wh,
                         render_scale: float = 1.0,
                         rescale: Optional[float] = None) -> dict:
    """Derive the full streak record from raw simulator quantities.

    Host-side numpy; mirrors ``bad_weather.py:208-239`` exactly, including
    the y-flip, z-negation and the degenerate-drop filter
    (max_width >= 1 and length >= 1).

    ``rescale`` reproduces the ``nuscenes_gan`` special case
    (``bad_weather.py:213-219``): positions are multiplied by it instead
    of divided by render_scale.

    Returns dict of arrays (M, ...) with only the surviving drops.
    """
    ip1 = np.asarray(ip1, np.float64).reshape(-1, 2)
    ip2 = np.asarray(ip2, np.float64).reshape(-1, 2)
    iw1 = np.asarray(iw1, np.float64).ravel()
    iw2 = np.asarray(iw2, np.float64).ravel()
    wp1 = np.asarray(wp1, np.float64).reshape(-1, 3).copy()
    wp2 = np.asarray(wp2, np.float64).reshape(-1, 3).copy()

    if rescale is not None:
        ip1, ip2 = ip1 * rescale, ip2 * rescale
        iw1, iw2 = iw1 * rescale, iw2 * rescale
    else:
        ip1, ip2 = ip1 / render_scale, ip2 / render_scale
        iw1, iw2 = iw1 / render_scale, iw2 / render_scale

    w, h = int(image_wh[0]), int(image_wh[1])
    ip1 = ip1.copy()
    ip2 = ip2.copy()
    ip1[:, 1] = h - ip1[:, 1]
    ip2[:, 1] = h - ip2[:, 1]
    wp1[:, 2] *= -1.0
    wp2[:, 2] *= -1.0

    diff = np.abs(ip1 - ip2)
    max_width = np.maximum(np.maximum(iw1, iw2), 0).astype(np.int64)

    norm = np.linalg.norm(diff, axis=-1)
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.where(norm > 0, max_width / norm, np.inf)

    ip1r = np.round(ip1)
    ip2r = np.round(ip2)
    length = np.ceil(np.linalg.norm(ip1r - ip2r, axis=-1)).astype(np.int64)

    keep = (max_width >= 1) & (length >= 1)
    drop_type = np.where(max_width >= 4, TYPE_BIG,
                         np.where(max_width > 1, TYPE_MEDIUM, TYPE_SMALL))
    return {
        "ip1": ip1r[keep].astype(np.float32),
        "ip2": ip2r[keep].astype(np.float32),
        "iw1": iw1[keep].astype(np.float32),
        "iw2": iw2[keep].astype(np.float32),
        "wp1": wp1[keep].astype(np.float32),
        "wp2": wp2[keep].astype(np.float32),
        "max_width": max_width[keep].astype(np.int32),
        "length": length[keep].astype(np.int32),
        "ratio": ratio[keep].astype(np.float32),
        "drop_type": drop_type[keep].astype(np.int32),
    }


def cull_to_frame(rec: dict, image_wh) -> dict:
    """In-frame culling (reference ``generator.py:413-420``): keep drops
    with 1 <= max_width < max(H, W), 1 <= length < max(H, W), and at
    least one endpoint inside the frame."""
    w, h = int(image_wh[0]), int(image_wh[1])
    m = max(h, w)
    ip1, ip2 = rec["ip1"], rec["ip2"]

    def _in(p):
        return ((0 <= p[:, 0]) & (p[:, 0] < w)
                & (0 <= p[:, 1]) & (p[:, 1] < h))

    keep = ((rec["max_width"] >= 1) & (rec["max_width"] < m)
            & (rec["length"] >= 1) & (rec["length"] < m)
            & (_in(ip1) | _in(ip2)))
    return {k: v[keep] for k, v in rec.items()}


def pack_drop_batch(rec: dict, capacity: int) -> DropBatch:
    """Pad a host record dict into a fixed-capacity DropBatch."""
    n = len(rec["ip1"])
    if n > capacity:
        # Keep the widest drops (most visible) if over capacity.
        order = np.argsort(-rec["max_width"], kind="stable")[:capacity]
        rec = {k: v[order] for k, v in rec.items()}
        n = capacity

    def pad(a, fill=0):
        out = np.full((capacity,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return jnp.asarray(out)

    valid = np.zeros((capacity,), bool)
    valid[:n] = True
    return DropBatch(
        ip1=pad(rec["ip1"]), ip2=pad(rec["ip2"]),
        iw1=pad(rec["iw1"]), iw2=pad(rec["iw2"]),
        wp1=pad(rec["wp1"]), wp2=pad(rec["wp2"]),
        max_width=pad(rec["max_width"]), length=pad(rec["length"], 1),
        ratio=pad(rec["ratio"]), drop_type=pad(rec["drop_type"]),
        valid=jnp.asarray(valid))
