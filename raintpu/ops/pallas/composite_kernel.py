"""Pallas TPU kernel: streak scatter-accumulation into field maps.

XLA's scatter-add on TPU serializes badly with large duplicate-index
scatters (the compositing path scatters ~25M patch pixels per batch).
This kernel replaces it with the idiomatic TPU pattern: a sequential
grid over drops whose window updates are explicit DMA read-modify-write
operations against HBM-resident field maps, with patch blocks streamed
into VMEM by the Pallas pipeline.

Per drop (grid step): DMA the (PH, PW) windows of alpha / log-att /
additive at the drop's anchor into VMEM scratch, accumulate

    alpha   += g
    log_att += log(1 - g * lo)
    additive+= g * add_rgb

and DMA back. Windows are patch-sized (tens of KB), so each step is a
few microseconds of DMA + VPU; drops of one bucket run back-to-back on
the core with the next patch prefetching in the background.

The field canvases are padded by (PH, PW) (anchors are pre-clipped to
[0, W] x [0, H]) so windows never go out of bounds.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_EPS = 1e-6


def _kernel(n_ref,               # SMEM (1,) int32 — number of valid drops
            ax_ref,              # SMEM (C,) int32 — scalar prefetch
            ay_ref,              # SMEM (C,) int32
            params_ref,          # SMEM (4, C) f32 — rows lo, add_r/g/b
            patches_ref,         # VMEM block (1, PH, PW)
            a_in, l_in, r_in, g_in, b_in,   # ANY — aliased to outputs
            alpha_ref, logatt_ref, addr_ref, addg_ref, addb_ref,
            scr, sems):
    del a_in, l_in, r_in, g_in, b_in  # contents live in the aliased outs
    c = pl.program_id(0)
    ph, pw = scr.shape[1], scr.shape[2]
    # NOTE: prefetch arrays are kept 1-D/row-major — SMEM pads the last
    # axis, so an (N, 2) layout would inflate ~64x and overflow SMEM.
    # Anchors were tile-aligned host-side; the hint lets Mosaic prove
    # the HBM DMA slices are (8, 128)-tile aligned.
    ax = pl.multiple_of(ax_ref[c], 128)
    ay = pl.multiple_of(ay_ref[c], 8)

    # Invalid drops are compacted to the tail; skip their DMAs entirely
    # (the kernel is DMA-latency bound, so this is ~capacity/valid x).
    @pl.when(c < n_ref[0])
    def _():
        outs = (alpha_ref, logatt_ref, addr_ref, addg_ref, addb_ref)
        wins = [o.at[pl.ds(ay, ph), pl.ds(ax, pw)] for o in outs]

        dmas = [pltpu.make_async_copy(w, scr.at[i], sems.at[i])
                for i, w in enumerate(wins)]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

        g = patches_ref[0]
        lo = params_ref[0, c]
        scr[0] = scr[0] + g
        scr[1] = scr[1] + jnp.log(jnp.maximum(1.0 - g * lo, LOG_EPS))
        for ch in range(3):
            scr[2 + ch] = scr[2 + ch] + g * params_ref[1 + ch, c]

        dmas = [pltpu.make_async_copy(scr.at[i], w, sems.at[i])
                for i, w in enumerate(wins)]
        for d in dmas:
            d.start()
        # Complete before the next drop's reads (windows may overlap).
        for d in dmas:
            d.wait()


SUBLANE = 8
LANE = 128


def _tile_align_patches(patches: jnp.ndarray, anchor: jnp.ndarray):
    """Shift each patch by its anchor's within-tile offset so DMA window
    starts are (8, 128)-aligned (a Mosaic requirement for HBM slices).

    The dynamic (dy, dx) in [0,8) x [0,128) shifts are applied as one-hot
    shift matrices on the MXU — no gathers, no lane-dynamic slicing.
    Returns (shifted (C, PH+8, PW+128), aligned_anchor (C, 2)).
    """
    c, ph, pw = patches.shape
    ax, ay = anchor[:, 0], anchor[:, 1]
    ax_al = (ax // LANE) * LANE
    ay_al = (ay // SUBLANE) * SUBLANE
    dx = (ax - ax_al).astype(jnp.int32)
    dy = (ay - ay_al).astype(jnp.int32)

    # Window sizes must themselves be tile multiples.
    ph2 = -(-(ph + SUBLANE) // SUBLANE) * SUBLANE
    pw2 = -(-(pw + LANE) // LANE) * LANE
    ii = jnp.arange(ph2, dtype=jnp.int32)
    kk = jnp.arange(ph, dtype=jnp.int32)
    sy = (ii[None, :, None] == kk[None, None, :] + dy[:, None, None]
          ).astype(jnp.float32)                       # (C, PH2, PH)
    jj = jnp.arange(pw, dtype=jnp.int32)
    ll = jnp.arange(pw2, dtype=jnp.int32)
    sx = (ll[None, None, :] == jj[None, :, None] + dx[:, None, None]
          ).astype(jnp.float32)                       # (C, PW, PW2)
    shifted = jnp.einsum("cik,ckj->cij", sy, patches,
                         preferred_element_type=jnp.float32)
    shifted = jnp.einsum("cij,cjl->cil", shifted, sx,
                         preferred_element_type=jnp.float32)
    return shifted, jnp.stack([ax_al, ay_al], -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scatter_bucket_pallas(patches: jnp.ndarray,   # (C, PH, PW) f32
                          anchor: jnp.ndarray,    # (C, 2) int32
                          lo: jnp.ndarray,        # (C,)
                          add_rgb: jnp.ndarray,   # (C, 3)
                          fields,                 # 5-tuple of (HP, WP) f32
                          n_valid=None,           # (1,) int32
                          interpret: bool = False):
    """Accumulate one bucket's drops into the padded field planes
    (alpha, log_att, add_r, add_g, add_b) — all plain 2-D arrays so
    every window DMA is a contiguous tile-aligned 2-D copy. The planes
    must be padded by at least (PH + 16, PW + 256) beyond valid anchors.
    Returns the updated 5-tuple.
    """
    patches, anchor = _tile_align_patches(patches, anchor)
    c, ph, pw = patches.shape
    hp, wp = fields[0].shape
    params = jnp.concatenate([lo[None, :], add_rgb.T], axis=0)  # (4, C)
    if n_valid is None:
        n_valid = jnp.full((1,), c, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, ph, pw), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        scratch_shapes=[
            pltpu.VMEM((5, ph, pw), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 5,
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3, 9: 4},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(n_valid, anchor[:, 0], anchor[:, 1], params, patches, *fields)
    return tuple(out)


def _kernel_batched(n_ref,           # SMEM (B,) int32 — valid drops/frame
                    ax_ref,          # SMEM (B*C,) int32
                    ay_ref,          # SMEM (B*C,) int32
                    params_ref,      # SMEM (4, B*C) f32
                    patches_ref,     # VMEM block (1, 1, PH, PW)
                    a_in, l_in, r_in, g_in, b_in,
                    alpha_ref, logatt_ref, addr_ref, addg_ref, addb_ref,
                    scr, sems):
    """Batched variant: grid (B, C); fields are (B, HP, WP) planes and
    each window is plane[b] at the drop's aligned anchor."""
    del a_in, l_in, r_in, g_in, b_in
    b = pl.program_id(0)
    c = pl.program_id(1)
    fi = b * pl.num_programs(1) + c          # flat (b, c) index
    ph, pw = scr.shape[1], scr.shape[2]
    ax = pl.multiple_of(ax_ref[fi], 128)
    ay = pl.multiple_of(ay_ref[fi], 8)

    @pl.when(c < n_ref[b])
    def _():
        outs = (alpha_ref, logatt_ref, addr_ref, addg_ref, addb_ref)
        wins = [o.at[b, pl.ds(ay, ph), pl.ds(ax, pw)] for o in outs]

        dmas = [pltpu.make_async_copy(w, scr.at[i], sems.at[i])
                for i, w in enumerate(wins)]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

        g = patches_ref[0, 0]
        lo = params_ref[0, fi]
        scr[0] = scr[0] + g
        scr[1] = scr[1] + jnp.log(jnp.maximum(1.0 - g * lo, LOG_EPS))
        for ch in range(3):
            scr[2 + ch] = scr[2 + ch] + g * params_ref[1 + ch, fi]

        dmas = [pltpu.make_async_copy(scr.at[i], w, sems.at[i])
                for i, w in enumerate(wins)]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def scatter_bucket_pallas_batched(patches, anchor, lo, add_rgb, fields,
                                  n_valid=None,    # (B,) int32
                                  interpret: bool = False):
    """Batched bucket scatter: patches (B, C, PH, PW), anchor (B, C, 2),
    lo (B, C), add_rgb (B, C, 3), fields = 5 x (B, HP, WP)."""
    bsz, c = patches.shape[:2]
    patches, anchor = jax.vmap(_tile_align_patches)(patches, anchor)
    ph, pw = patches.shape[2:]
    hp, wp = fields[0].shape[1:]
    if n_valid is None:
        n_valid = jnp.full((bsz,), c, jnp.int32)
    params = jnp.concatenate(
        [lo.reshape(1, -1), add_rgb.reshape(-1, 3).T], axis=0)  # (4, B*C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bsz, c),
        in_specs=[
            pl.BlockSpec((1, 1, ph, pw), lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        scratch_shapes=[
            pltpu.VMEM((5, ph, pw), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    out = pl.pallas_call(
        _kernel_batched,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bsz, hp, wp), jnp.float32)] * 5,
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3, 9: 4},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(n_valid, anchor[..., 0].reshape(-1), anchor[..., 1].reshape(-1),
      params, patches, *fields)
    return tuple(out)


def composite_drops_pallas_batched(image_hw, buckets, lo_all, add_rgb_all,
                                   interpret: bool = False):
    """Batched FieldMaps accumulation: bucket arrays carry a leading
    batch dim (B, C, ...); lo_all/add_rgb_all are (B, N)/(B, N, 3).
    Returns FieldMaps with leading batch dim."""
    from raintpu.ops.composite import FieldMaps

    h, w = image_hw
    bsz = buckets[0].patches.shape[0]
    max_ph = max(b.patches.shape[2] for b in buckets) + 2 * SUBLANE
    max_pw = max(b.patches.shape[3] for b in buckets) + 2 * LANE
    hp = -(-(h + max_ph) // SUBLANE) * SUBLANE
    wp = -(-(w + max_pw) // LANE) * LANE

    fields = tuple(jnp.zeros((bsz, hp, wp), jnp.float32)
                   for _ in range(5))
    for b in buckets:
        take = jax.vmap(lambda l, a, i, v: (
            jnp.where(v, l[i], 0.0), jnp.where(v[:, None], a[i], 0.0)))
        lo, add = take(lo_all, add_rgb_all, b.drop_idx, b.valid)
        # Valid drops are compacted to the front of each bucket.
        n_valid = jnp.sum(b.valid.astype(jnp.int32), axis=1)
        fields = scatter_bucket_pallas_batched(
            b.patches, b.anchor, lo, add, fields, n_valid,
            interpret=interpret)

    alpha, log_att, ar, ag, ab = fields
    additive = jnp.stack([ar[:, :h, :w], ag[:, :h, :w], ab[:, :h, :w]],
                         axis=-1)
    return FieldMaps(log_att=log_att[:, :h, :w], additive=additive,
                     alpha=alpha[:, :h, :w])


def composite_drops_pallas(image_hw, buckets, lo_all, add_rgb_all,
                           interpret: bool = False):
    """Pallas analogue of ops.composite.composite_drops.

    Returns a FieldMaps with the same semantics (padded canvases are
    internal; outputs are cropped to the image).
    """
    from raintpu.ops.composite import FieldMaps

    h, w = image_hw
    # Canvas pad: anchors reach (W, H); aligned windows reach a further
    # (PH + 2*SUBLANE, PW + 2*LANE); round the canvas to tile multiples.
    max_ph = max(b.patches.shape[1] for b in buckets) + 2 * SUBLANE
    max_pw = max(b.patches.shape[2] for b in buckets) + 2 * LANE
    hp = -(-(h + max_ph) // SUBLANE) * SUBLANE
    wp = -(-(w + max_pw) // LANE) * LANE

    fields = tuple(jnp.zeros((hp, wp), jnp.float32) for _ in range(5))
    for b in buckets:
        lo = jnp.where(b.valid, lo_all[b.drop_idx], 0.0)
        add = jnp.where(b.valid[:, None], add_rgb_all[b.drop_idx], 0.0)
        n_valid = jnp.sum(b.valid.astype(jnp.int32))[None]
        fields = scatter_bucket_pallas(b.patches, b.anchor, lo, add,
                                       fields, n_valid,
                                       interpret=interpret)

    alpha, log_att, ar, ag, ab = fields
    additive = jnp.stack([ar[:h, :w], ag[:h, :w], ab[:h, :w]], axis=-1)
    return FieldMaps(log_att=log_att[:h, :w], additive=additive,
                     alpha=alpha[:h, :w])
