"""Fused Pallas kernel: analytic streak rasterization + composite RMW.

The two-stage hot path (XLA rasterizes patches for every capacity slot,
then the composite kernel scatters them) wastes work three ways: invalid
slots are rasterized anyway (dense XLA), patches round-trip through HBM,
and the composite's window DMAs idle the VPU. This kernel fuses both
stages: per (frame, drop) grid step it

  1. starts the 5 field-window read DMAs,
  2. evaluates the drop's gray patch *in-kernel* directly over the
     tile-aligned window grid — inverse homography, damped DCT cosine
     series (Chebyshev recurrence), erf content window — pure VPU work
     that hides the DMA latency,
  3. accumulates alpha / log-attenuation / additive and writes back.

Invalid (padded) slots skip everything via the valid-count gate, so the
cost scales with *actual* drops, not bucket capacity.

Per-drop parameters and DCT coefficients arrive as lane-padded VMEM
blocks (SMEM holds only the DMA anchor offsets + valid counts — SMEM is
~1 MB and pads aggressively, so per-drop float payloads don't fit
there at production batch x capacity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_EPS = 1e-6
ALPHA_CUTOFF = 2e-4   # see ops.rasterize.ALPHA_CUTOFF
SUBLANE = 8
LANE = 128

# VMEM working-set budget per window slab: the kernel body keeps ~25
# (TILE_H, PW2) f32 buffers live, so slab area is capped and tall
# windows are processed in row tiles.
MAX_SLAB_AREA = 80_000


def plan_window(ph: int, pw: int, sublane: int = SUBLANE):
    """Tile-aligned window plan for a bucket: (ph2, pw2, tile_h, n_tiles).
    ph2 = n_tiles * tile_h (sublane-aligned); pw2 lane-aligned.
    ``sublane``: 8 for f32 field planes, 16 for bf16 (the TPU memory
    tile is (8, 128) x 4 bytes — half-precision doubles the sublane)."""
    ph2 = -(-(ph + sublane) // sublane) * sublane
    pw2 = -(-(pw + LANE) // LANE) * LANE
    n_tiles = max(1, -(-(ph2 * pw2) // MAX_SLAB_AREA))
    tile_h = -(-(-(-ph2 // n_tiles)) // sublane) * sublane
    ph2 = n_tiles * tile_h
    return ph2, pw2, tile_h, n_tiles


def bucket_strip_pad(ph: int, pw: int, radius: int,
                     sublane: int = SUBLANE) -> int:
    """Strip-eval pad for a bucket, or 0 when strip mode is off for it.

    The pad covers the erf content tails (content <= pw by routing,
    defocus sigma <= radius/4 so the 5-sigma tail <= 1.25 * radius);
    strip mode requires content + both tails to fit one LANE-wide
    strip AND a single-row-tile window plan. Shared by the render
    caller (render.frame.fused_field_planes) and the anchor/narrow
    computation (ops.rasterize.raster_params_frame) so the strip
    contract and the anchor basis can never drift apart."""
    pad = int(1.25 * radius) + 2
    if pw + 2 * pad > LANE:
        return 0
    if plan_window(ph, pw, sublane)[3] != 1:
        return 0
    return pad

# params row layout (26, B*C). P_SGX/P_SGY: blur sigma in NORMALIZED
# texture coordinates (ops.rasterize.fourier_drop_coefficients).
P_M00, P_M01, P_M02, P_M10, P_M11, P_M12, P_M20, P_M21, P_M22 = range(9)
P_MINCX, P_MINCY, P_WCX, P_WCY, P_SGX, P_SGY, P_LO = range(9, 16)
P_ADDR, P_ADDG, P_ADDB = range(16, 19)
# Pre-tau drop color — only read when the kernel runs with the
# saturation planes (PipelineConfig.compute_saturation_mask).
P_SATR, P_SATG, P_SATB = range(19, 22)
# Content band (UL, UU, VL, VU) in normalized texture coords: [0,1]
# except Big drops clipped by the image border, whose warp canvas crops
# content BEFORE the defocus blur (ops.rasterize._tex_band).
P_UL, P_UU, P_VL, P_VU = range(22, 26)
N_PARAMS = 26


def _erf(x):
    # Pallas TPU has no erf lowering; tanh approximation shared with the
    # XLA path (see ops.rasterize.tanh_erf).
    x3 = x * x * x
    return jnp.tanh(1.1283791671 * x + 0.1009055155 * x3)


def _patch_eval(prm, cy, cx, ax, ay, r_ranks, modes_y,
                modes_x, th, tw, tile_h, pw2):
    """Evaluate the drop's gray patch over the window grid (pure VPU).

    ``prm(k)`` / ``cy(r, m)`` / ``cx(r, m)`` return the drop's params
    and DCT coefficients — scalars for a single drop, or (1, pw2)
    lane vectors in pair mode (two drops side by side in the lane
    halves; every expression below broadcasts either way). ``ax``/
    ``ay`` follow the same convention."""
    ii = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, pw2), 0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, pw2), 1).astype(jnp.float32)
    lx = jj + (jnp.asarray(ax).astype(jnp.float32) - prm(P_MINCX))
    ly = ii + (jnp.asarray(ay).astype(jnp.float32) - prm(P_MINCY))

    hx = prm(P_M00) * lx + prm(P_M01) * ly + prm(P_M02)
    hy = prm(P_M10) * lx + prm(P_M11) * ly + prm(P_M12)
    hz = prm(P_M20) * lx + prm(P_M21) * ly + prm(P_M22)
    hz = jnp.where(jnp.abs(hz) < 1e-9, 1e-9, hz)
    inv_hz = 1.0 / hz
    xhat = (hx * inv_hz + 0.5) * (1.0 / tw)
    yhat = (hy * inv_hz + 0.5) * (1.0 / th)

    # Damped DCT series via Chebyshev recurrence, rank by rank.
    # MEASURED round 3: sharing the cos(m*theta) recurrence across
    # ranks (mode-outer, 438 -> 216 ops/px at R=6, My=16, Mx=8) is
    # SLOWER on hardware — 828 vs 899 img/s full-width, 1067 vs 1099
    # strip-mode — because it keeps R rank accumulators live and the
    # extra vector-register pressure costs more than the arithmetic
    # saved. Rank-outer keeps ~4 live buffers and wins; don't "optimize"
    # this into the shared form again without re-measuring.
    ty = jnp.cos(jnp.pi * yhat)
    tx = jnp.cos(jnp.pi * xhat)
    g = jnp.zeros((tile_h, pw2), jnp.float32)
    zero = jnp.zeros((tile_h, pw2), jnp.float32)
    for r in range(r_ranks):
        uy = zero + cy(r, 0)
        cm_prev = jnp.ones((tile_h, pw2), jnp.float32)
        cm = ty
        for m in range(1, modes_y):
            uy = uy + cy(r, m) * cm
            cm, cm_prev = 2.0 * ty * cm - cm_prev, cm
        vx = zero + cx(r, 0)
        cm_prev = jnp.ones((tile_h, pw2), jnp.float32)
        cm = tx
        for m in range(1, modes_x):
            vx = vx + cx(r, m) * cm
            cm, cm_prev = 2.0 * tx * cm - cm_prev, cm
        g = g + uy * vx

    # erf content window: blurred indicator of the TEXTURE RECT in
    # normalized texture coordinates — bit-consistent with the XLA
    # formulation in ops.rasterize._raster_bucket_fourier (see the
    # model comment there: a patch-space box window lets the mirror
    # basis fill rotate_bound's zero corners with streak energy).
    sqrt2 = 1.4142135
    sx = jnp.maximum(prm(P_SGX), 2e-3)
    sy = jnp.maximum(prm(P_SGY), 2e-3)
    ul, uu = prm(P_UL), prm(P_UU)
    vl, vu = prm(P_VL), prm(P_VU)
    win = (0.5 * (_erf((xhat - ul) / (sqrt2 * sx))
                  - _erf((xhat - uu) / (sqrt2 * sx)))
           * 0.5 * (_erf((yhat - vl) / (sqrt2 * sy))
                    - _erf((yhat - vu) / (sqrt2 * sy))))
    mx = 0.25 + 4.0 * sx
    my = 0.25 + 4.0 * sy
    win = jnp.where((xhat >= ul - mx) & (xhat <= uu + mx)
                    & (yhat >= vl - my) & (yhat <= vu + my), win, 0.0)
    g = jnp.clip(g, 0.0, 1.0) * win
    return jnp.where(g > ALPHA_CUTOFF, g, 0.0)


def _plane_contribs(g, prm, n_planes):
    """Per-plane contributions of patch g (alpha, log-att, additive
    rgb[, saturation rgb])."""
    lo = prm(P_LO)
    out = [g,
           jnp.log(jnp.maximum(1.0 - g * lo, LOG_EPS)),
           g * prm(P_ADDR), g * prm(P_ADDG), g * prm(P_ADDB)]
    if n_planes == 8:
        # Saturation planes: sum of clip(drop_rgb, 0, 1) per drop
        # (reference bad_weather.py:452-453,459-460).
        out += [jnp.clip(g * prm(P_SATR), 0.0, 1.0),
                jnp.clip(g * prm(P_SATG), 0.0, 1.0),
                jnp.clip(g * prm(P_SATB), 0.0, 1.0)]
    return out


def _accum_rows(scr_bank, g, prm, n_planes):
    """scr_bank[i] += contribution_i(g) for the plane layout.

    The planes may be bf16 (halves the window RMW bytes; built on the
    bytes-bound hypothesis the round-5 ablation later REFUTED — the
    window engine is per-tile-run-bound, and bf16 measured slower than
    f32 end to end, so f32 stays the default); contributions are
    computed in f32 and the accumulate rounds at store, so the only
    loss is one bf16 rounding per overlapping drop."""
    for i, c in enumerate(_plane_contribs(g, prm, n_planes)):
        acc = scr_bank[i]
        scr_bank[i] = (acc.astype(jnp.float32) + c).astype(acc.dtype)


def _accum_rows_strip(scr_bank, g, prm, n_planes, s, ds, pw2, tile_h,
                      no_roll: bool = False, narrow: bool = False):
    """Strip variant: g lives on a (tile_h_eval, LANE) strip whose
    image columns start s lanes and ds sublanes into the window
    (tile_h_eval = tile_h - sublane; the drop is evaluated from its
    TRUE anchor, not the tile-aligned one, so the alignment margin
    rows are never evaluated — 25% of the hottest rung's VPU work).
    Contributions are computed on the strip (the log transcendental
    included), stacked, zero-extended, row-rotated by ds and
    lane-rotated by s into window position, then accumulated. Outside
    the strip every contribution is exactly 0 (log(1 - 0*lo) = 0).

    The row roll is safe against cross-plane bleed by construction:
    each plane's block is bottom-padded with (tile_h - tile_h_eval)
    zero rows and ds < that pad, so the rows rotating across a plane
    boundary are always the previous plane's zero padding.

    Lane placement stays 128 lanes wide the whole way: the strip's
    window span [s, s+128) covers at most the two lane tiles of the
    pw2 = 256 window, so a cyclic roll by s (mod 128) followed by two
    STATIC-offset masked adds places it — tile 0 takes lanes j >= s,
    tile 1 takes j < s (for s = 128 exactly, roll is 0 and everything
    lands in tile 1). This skips the old pad-to-pw2 + 256-wide roll
    (~1.5 full-window passes per drop).

    For bf16 planes the cast happens AFTER the pads + rolls: Mosaic's
    tpu.dynamic_rotate is 32-bit-only (measured on v5e: "Rotate with
    non-32-bit data" is not implemented), so the rolls run in f32 and
    the narrowing cast lands just before the accumulate.

    NARROW mode (round 5): the caller proved the drop's nonzero
    content fits one 128-lane tile and DMA'd only that tile into the
    bank's FIRST lane tile; ``s`` arrives relative to that tile
    (s + span <= LANE). The roll then places every nonzero lane at its
    final position inside lanes [0, LANE) and the wrapped lanes
    (j < s, which hold eval lanes >= LANE - s >= span) are zero by the
    containment contract — one unmasked add, no second tile."""
    assert pw2 == 2 * LANE, pw2   # strip windows always plan 2 tiles
    the = g.shape[0]
    dtype = scr_bank.dtype
    contribs = jnp.stack(_plane_contribs(g, prm, n_planes))
    if the < tile_h:
        contribs = jnp.pad(contribs,
                           ((0, 0), (0, tile_h - the), (0, 0)))
    flat = contribs.reshape(n_planes * tile_h, LANE)
    if no_roll:
        # Ablation only (kernel_ablation tool): skip the two dynamic
        # rotates to price them; placement becomes wrong on purpose.
        rolled = flat.reshape(n_planes, tile_h, LANE).astype(dtype)
    else:
        if the < tile_h:
            flat = pltpu.roll(flat, ds, 0)
        # s is the SIGNED window start of the strip's lane 0 (pair half
        # 1 can start up to 64 lanes left of the window; those wrap
        # lanes are its zeroed other half). jnp.mod keeps the roll
        # nonnegative.
        rolled = pltpu.roll(flat, jnp.mod(s, LANE),
                            1).reshape(n_planes, tile_h,
                                       LANE).astype(dtype)
    if narrow:
        for i in range(n_planes):
            scr_bank[i, :, 0:LANE] = scr_bank[i, :, 0:LANE] + rolled[i]
        return
    j = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    for i in range(n_planes):
        scr_bank[i, :, 0:LANE] = (
            scr_bank[i, :, 0:LANE]
            + jnp.where(j >= s, rolled[i], jnp.zeros((), dtype)))
        scr_bank[i, :, LANE:2 * LANE] = (
            scr_bank[i, :, LANE:2 * LANE]
            + jnp.where(j < s, rolled[i], jnp.zeros((), dtype)))


def _make_kernel(r_ranks: int, modes_y: int, modes_x: int,
                 th: int, tw: int, n_tiles: int, n_planes: int,
                 sub: int = SUBLANE):
    """Multi-tile kernel for the big-window buckets, pipelined across
    its row tiles: a drop's tiles are DISJOINT row bands, so tile t+1's
    read can fly during tile t's compute with no hazard (two scratch
    banks, statically scheduled — n_tiles is a Python constant). Drops
    stay serial relative to each other: all writes are quiesced before
    the step ends, so the next grid step's reads are ordered."""
    def kernel(n_ref, ax_ref, ay_ref,
               wd_ref,            # per-drop wide flag (narrow mode;
                                  # multi-tile windows are always wide)
               prm_ref,           # VMEM block (1, 1, 128) — param lane
               ayc_ref,           # VMEM block (1, 1, R, MYP)
               bxc_ref,           # VMEM block (1, 1, R, MXP)
               in_f, out_f, scr2, sems_r, sems_w):
        del wd_ref
        # scr2: (2, n_planes, TILE_H, PW2); sems_r/sems_w: DMA (2,).
        b = pl.program_id(0)
        c = pl.program_id(1)
        fi = b * pl.num_programs(1) + c
        tile_h, pw2 = scr2.shape[2], scr2.shape[3]

        def prm(k):
            return prm_ref[0, 0, 0, k]

        @pl.when(c < n_ref[b])
        def _():
            # ay arrives RAW (the pipelined kernel needs the true row
            # start for its row strip); align here.
            ax = pl.multiple_of(ax_ref[fi], 128)
            ay0 = pl.multiple_of((ay_ref[fi] // sub) * sub, sub)

            def win(t):
                return out_f.at[b, :, pl.ds(ay0 + t * tile_h, tile_h),
                                pl.ds(ax, pw2)]

            # Prologue: start tile 0's read.
            pltpu.make_async_copy(win(0), scr2.at[0], sems_r.at[0]
                                  ).start()
            for t in range(n_tiles):
                cur, oth = t % 2, 1 - (t % 2)
                if t + 1 < n_tiles:
                    # Bank `oth` must be free of its previous write
                    # (tile t-1) before prefetching tile t+1 into it.
                    if t >= 1:
                        pltpu.make_async_copy(
                            scr2.at[oth], win(t - 1),
                            sems_w.at[oth]).wait()
                    pltpu.make_async_copy(
                        win(t + 1), scr2.at[oth], sems_r.at[oth]
                        ).start()

                g = _patch_eval(prm, lambda r, m: ayc_ref[0, 0, r, m],
                                lambda r, m: bxc_ref[0, 0, r, m], ax,
                                ay0 + t * tile_h, r_ranks,
                                modes_y, modes_x, th, tw, tile_h, pw2)

                pltpu.make_async_copy(win(t), scr2.at[cur],
                                      sems_r.at[cur]).wait()
                _accum_rows(scr2.at[cur], g, prm, n_planes)
                pltpu.make_async_copy(scr2.at[cur], win(t),
                                      sems_w.at[cur]).start()

            # Quiesce: the next grid step (a different drop) may read
            # overlapping windows, so every write must land here.
            last = (n_tiles - 1) % 2
            pltpu.make_async_copy(scr2.at[last], win(n_tiles - 1),
                                  sems_w.at[last]).wait()
            if n_tiles >= 2:
                pltpu.make_async_copy(scr2.at[1 - last],
                                      win(n_tiles - 2),
                                      sems_w.at[1 - last]).wait()

    return kernel


def _make_kernel_pipelined(r_ranks: int, modes_y: int, modes_x: int,
                           th: int, tw: int, n_planes: int,
                           strip_pad: int = 0, sub: int = SUBLANE,
                           row_strip: bool = True, pair: bool = False,
                           narrow: bool = False,
                           ablate: frozenset = frozenset()):
    """Depth-3 pipelined kernel (single-tile windows only).

    The serial kernel pays the full HBM round-trip latency per drop
    (~5 us/drop measured — 83% of the whole render step at the
    headline config). A depth-2 version that prefetched one window
    ahead still left the write-back wait on the critical path (the
    write issued at the end of step c-1 had to land before step c
    could reuse its bank). With THREE scratch banks, write(j) is not
    normally waited until step j+3 — two full steps of slack — so in
    the steady state every wait is on a long-completed DMA and the
    per-step cost collapses to the VPU patch evaluation.

    Read-after-write hazards are detected from the scalar-prefetched
    anchors (windows overlap iff |dax| < PW2 and |day| < TILE_H). The
    wait schedule (verified by exhaustive simulation over all overlap
    patterns up to n=6 plus 20k random cases — exact issue/wait
    pairing, bank integrity, no RAW races):

      write(j) is waited exactly once, at
        t1      step j+1  iff ov(j+1, j)          [fallback read j+1]
        t2      step j+2  iff ov(j+2, j) and not t1
        t3e     step j+2  iff read(j+3) prefetched, not t1/t2
        t3l     step j+3  iff read(j+3) falls back, not t1/t2
        cleanup step n-1  for writes whose wait point exceeds n-1
      read(c) is issued at step c-1 (prefetch) iff it overlaps
        neither window c-1 nor c-2; else at step c after the
        overlapping writes' waits (t1/t2) — and is always waited at
        step c before accumulation.

    Banks are indexed statically by unrolling the grid step mod 3
    (dynamic semaphore indices are not relied on).

    NARROW MODE (round 5, ``narrow=True``; requires strip mode): the
    round-5 cost ablation priced the 0.80 us per-valid-drop constant
    at 72% window DMA (read 0.343 + write 0.299 us). Narrow windows
    were built on the bytes-bound hypothesis and measured NEUTRAL —
    the follow-up tile_h sweep showed the window engine's cost is
    ~9.8 ns per (8-row x plane) tile RUN plus ~0.19 us/drop of
    descriptor issue, independent of run LENGTH, so halving bytes at
    equal run count buys nothing (BASELINE.md round-5). The mode is
    kept (bit-exact, value-gated, and its containment flags drive the
    resident kernel's single-tile accumulate) but it is not a perf
    lever. Most strip drops' content + tails fit a single 128-lane
    tile: the caller anchors
    those windows at the content's OWN lane tile and flags them via
    the scalar-prefetched ``wd`` row, and every window DMA of a narrow
    step copies (n_planes, tile_h, LANE) — HALF the bytes — into the
    bank's first lane tile; the accumulate becomes one unmasked add
    (the roll's wrapped lanes are zero by the containment contract,
    see _accum_rows_strip). The hazard SCHEDULE is untouched: issue
    and wait sites are identical, only each copy's static shape
    switches on wide(j), a pure function of step j's prefetched
    scalars, so every wait reconstructs exactly the descriptor its
    issue used. The overlap predicate stays the conservative
    full-width test (narrow windows are subsets of wide ones at the
    same anchor), which can only add waits, never miss one.

    PAIR MODE (round 3, ``pair=True``; requires strip mode with
    pw + 2*strip_pad <= LANE/2): two consecutive drops are evaluated
    in ONE patch eval, side by side in the two 64-lane halves of the
    (tile_h_eval, LANE) strip — per-drop parameters become (1, LANE)
    lane-selected vectors, so the series recurrence (the kernel's VPU
    roofline) runs once per PAIR. Even steps evaluate the pair into a
    stash scratch; each step then masks out its own half, rolls it
    into window position and accumulates. The per-drop window DMAs,
    RAW-hazard predicates and wait schedule are completely unchanged —
    drops stay serial with respect to memory.

    ``ablate`` (tools/kernel_ablation ONLY — never production): a set
    of trace-time knockouts pricing the per-drop cost components on
    hardware. "noeval" zeroes the patch eval, "noroll" skips the
    placement rotates, "noaccum" skips the accumulate, "noread"/
    "nowrite" drop the window DMAs (with their waits); "nordwait"
    keeps the read issues but skips the read wait (prices latency
    exposure vs issue cost). Any non-empty set renders garbage by
    design. Knockouts compose with narrow mode (the ablated DMAs are
    simply the narrow/wide-shaped ones).
    """
    ab_eval = "noeval" in ablate
    ab_roll = "noroll" in ablate
    ab_accum = "noaccum" in ablate
    ab_read = "noread" in ablate
    ab_write = "nowrite" in ablate
    ab_rdwait = ("nordwait" in ablate) or ab_read
    assert not narrow or strip_pad, "narrow mode requires strip mode"
    def kernel(n_ref, ax_ref, ay_ref, wd_ref, prm_ref, ayc_ref,
               bxc_ref, *rest):
        if pair:
            (prm2_ref, ayc2_ref, bxc2_ref, in_f, out_f,
             scr3, stash, sems_r, sems_w) = rest
        else:
            in_f, out_f, scr3, sems_r, sems_w = rest
        # scr3: (3, n_planes, TH, PW2); sems_r/sems_w: DMA (3,).
        b = pl.program_id(0)
        c = pl.program_id(1)
        cap = pl.num_programs(1)
        fi = b * cap + c
        tile_h, pw2 = scr3.shape[2], scr3.shape[3]
        n = n_ref[b]

        def prm(k):
            return prm_ref[0, 0, 0, k]

        def anchors(off):
            # ay arrives RAW (true content row start); windows anchor
            # at the sublane-aligned position.
            idx = jnp.clip(fi + off, b * cap, b * cap + cap - 1)
            return (pl.multiple_of(ax_ref[idx], 128),
                    pl.multiple_of((ay_ref[idx] // sub) * sub, sub))

        def wide_at(off):
            if not narrow:
                return None
            idx = jnp.clip(fi + off, b * cap, b * cap + cap - 1)
            return wd_ref[idx] != 0

        def win_at(a):
            return out_f.at[b, :, pl.ds(a[1], tile_h),
                            pl.ds(a[0], pw2)]

        def win_dma(a, bank, wide, write, wait):
            """One window<->bank DMA site: start (wait=False) or wait
            (wait=True) the read (write=False) or write DMA of the
            step whose window anchor is ``a`` and wide flag ``wide``.
            Narrow steps copy only the bank's first lane tile — issue
            and wait pick the SAME shape from the same predicate, so
            semaphore byte counts always match."""
            sems = sems_w if write else sems_r

            def go(win, bk):
                src, dst = (bk, win) if write else (win, bk)
                cp = pltpu.make_async_copy(src, dst, sems.at[bank])
                cp.wait() if wait else cp.start()

            if not narrow:
                go(win_at(a), scr3.at[bank])
                return
            pl.when(wide)(lambda: go(win_at(a), scr3.at[bank]))
            pl.when(~wide)(lambda: go(
                out_f.at[b, :, pl.ds(a[1], tile_h), pl.ds(a[0], LANE)],
                scr3.at[bank, :, :, pl.ds(0, LANE)]))

        def ov(a, bb):
            return ((jnp.abs(a[0] - bb[0]) < pw2)
                    & (jnp.abs(a[1] - bb[1]) < tile_h))

        @pl.when(c < n)
        def _():
            # All scalar work lives under the valid gate: with it, the
            # marginal gated (empty) step costs ~0.06 us (round-3 kprof;
            # the round-2 "0.8 us/gated-step" figure was a standalone-
            # harness fields-copy artifact), so padded capacity is cheap
            # but not free.
            a_c = anchors(0)
            a_m1, a_m2, a_m3 = anchors(-1), anchors(-2), anchors(-3)
            a_p1 = anchors(1)
            wd_c = wide_at(0)
            wd_m1, wd_m2, wd_m3 = wide_at(-1), wide_at(-2), wide_at(-3)
            wd_p1 = wide_at(1)

            hz1_c = (c >= 1) & ov(a_c, a_m1)
            hz2_c = (c >= 2) & ov(a_c, a_m2)
            hz1_cm1 = (c >= 2) & ov(a_m1, a_m2)
            hz1_cm2 = (c >= 3) & ov(a_m2, a_m3)
            hz2_cm1 = (c >= 3) & ov(a_m1, a_m3)
            hz1_cp1 = ov(a_p1, a_c)
            hz2_cp1 = (c >= 1) & ov(a_p1, a_m1)
            prefetched_c = (c >= 1) & ~hz1_c & ~hz2_c
            prefetch_next = (c + 1 < n) & ~hz1_cp1 & ~hz2_cp1
            for par in (0, 1, 2):   # static bank unroll: bank = c % 3
                cur = par
                m1 = (par - 1) % 3
                m2 = (par - 2) % 3

                @pl.when((c % 3) == par)
                def _(cur=cur, m1=m1, m2=m2):
                    if not ab_write:
                        # t1: fallback read(c) overlaps write(c-1).
                        @pl.when(hz1_c)
                        def _():
                            win_dma(a_m1, m1, wd_m1, write=True,
                                    wait=True)

                        # t2: fallback read(c) overlaps write(c-2).
                        @pl.when(hz2_c & ~hz1_cm1)
                        def _():
                            win_dma(a_m2, m2, wd_m2, write=True,
                                    wait=True)

                    # Fallback/prologue read(c) into bank cur.
                    @pl.when(~prefetched_c)
                    def _():
                        if not ab_write:
                            # t3-late: bank cur still owed write(c-3).
                            @pl.when((c >= 3) & ~hz1_cm2 & ~hz2_cm1)
                            def _():
                                win_dma(a_m3, cur, wd_m3, write=True,
                                        wait=True)
                        if not ab_read:
                            win_dma(a_c, cur, wd_c, write=False,
                                    wait=False)

                    # Prefetch read(c+1) into bank m2 (== (c+1) % 3).
                    @pl.when(prefetch_next)
                    def _():
                        if not ab_write:
                            # t3-early: free that bank of write(c-2).
                            @pl.when((c >= 2) & ~hz1_cm1 & ~hz2_c)
                            def _():
                                win_dma(a_m2, m2, wd_m2, write=True,
                                        wait=True)
                        if not ab_read:
                            win_dma(a_p1, m2, wd_p1, write=False,
                                    wait=False)

            if strip_pad:
                # Strip mode (round 3): this bucket's content + erf
                # tails are guaranteed to fit in one LANE-wide strip
                # (pw + 2*strip_pad <= LANE, checked by the caller), so
                # the patch is evaluated on (tile_h_eval, LANE) — half
                # the VPU lanes of the full window — and rotated into
                # window position at accumulate time. With row_strip
                # the evaluation also starts at the drop's TRUE row
                # (ds sublanes into the window), skipping the
                # tile-alignment margin rows entirely: tile_h_eval =
                # tile_h - sub, another 8-25% of the eval grid. DMAs
                # and hazard logic are unchanged (windows stay
                # (tile_h, pw2)).
                the = tile_h - sub if row_strip else tile_h
                s = jnp.clip(
                    jnp.floor(prm(P_MINCX)).astype(jnp.int32)
                    - strip_pad - a_c[0], 0, pw2 - LANE)
                ds = ay_ref[fi] - a_c[1] if row_strip else 0
                if ab_eval:
                    g = jnp.zeros((the, LANE), jnp.float32)
                elif pair:
                    # Pair mode: even steps evaluate drops (c, c+1)
                    # side by side in the lane halves; odd steps reuse
                    # the stash. The eval's per-drop params/coefs are
                    # (1, LANE) lane selects between the two drops'
                    # scalars (cheap: one vreg op per constant), and
                    # each half's x/y origins are its OWN strip/row
                    # offsets, so the stash halves are exactly what
                    # the two per-drop evals would have produced.
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (1, LANE), 1)
                    half = lane < (LANE // 2)

                    @pl.when((c % 2) == 0)   # body is valid-gated already
                    def _():
                        def prmv(k):
                            return jnp.where(half, prm_ref[0, 0, 0, k],
                                             prm2_ref[0, 0, 0, k])

                        def cyv(r, m):
                            return jnp.where(half, ayc_ref[0, 0, r, m],
                                             ayc2_ref[0, 0, r, m])

                        def cxv(r, m):
                            return jnp.where(half, bxc_ref[0, 0, r, m],
                                             bxc2_ref[0, 0, r, m])

                        a_n = anchors(1)
                        s2 = jnp.clip(
                            jnp.floor(prm2_ref[0, 0, 0, P_MINCX]
                                      ).astype(jnp.int32)
                            - strip_pad - a_n[0], 0, pw2 - LANE)
                        idx2 = jnp.clip(fi + 1, b * cap,
                                        b * cap + cap - 1)
                        ds2 = (ay_ref[idx2] - a_n[1] if row_strip
                               else 0)
                        ox = jnp.where(half, a_c[0] + s,
                                       a_n[0] + s2 - LANE // 2)
                        oy = jnp.where(half, a_c[1] + ds,
                                       a_n[1] + ds2)
                        stash[...] = _patch_eval(
                            prmv, cyv, cxv, ox, oy, r_ranks, modes_y,
                            modes_x, th, tw, the, LANE)

                    # Own half's lanes: [0, 64) on even steps, [64, 128)
                    # on odd. Computed as an int comparison — Mosaic
                    # cannot legalize arith.select on i1 vectors
                    # (jnp.where(cond, half, ~half) fails to compile).
                    keep = (lane // (LANE // 2)) == (c % 2)
                    g = jnp.where(keep, stash[...], 0.0)
                    # Own half's placement start: half 0's content
                    # begins at eval lane 0 (start s); half 1's at
                    # eval lane 64, i.e. window start s - 64 — may be
                    # NEGATIVE, which the accumulate's signed tile
                    # masks handle (the wrapped lanes are the zeroed
                    # other half by construction).
                    s = jnp.where((c % 2) == 0, s, s - LANE // 2)
                else:
                    g = _patch_eval(prm,
                                    lambda r, m: ayc_ref[0, 0, r, m],
                                    lambda r, m: bxc_ref[0, 0, r, m],
                                    a_c[0] + s, a_c[1] + ds, r_ranks,
                                    modes_y, modes_x, th, tw, the,
                                    LANE)
            else:
                s = ds = None
                if ab_eval:
                    g = jnp.zeros((tile_h, pw2), jnp.float32)
                else:
                    g = _patch_eval(prm,
                                    lambda r, m: ayc_ref[0, 0, r, m],
                                    lambda r, m: bxc_ref[0, 0, r, m],
                                    a_c[0], a_c[1],
                                    r_ranks, modes_y, modes_x, th, tw,
                                    tile_h, pw2)

            for par in (0, 1, 2):
                cur = par
                m1 = (par - 1) % 3
                m2 = (par - 2) % 3

                @pl.when((c % 3) == par)
                def _(cur=cur, m1=m1, m2=m2):
                    if not ab_rdwait:
                        win_dma(a_c, cur, wd_c, write=False, wait=True)

                    if not ab_accum:
                        if strip_pad and narrow:
                            # Narrow steps place with one unmasked add
                            # into the bank's first lane tile; wide
                            # steps keep the two masked tile adds.
                            pl.when(wd_c)(lambda: _accum_rows_strip(
                                scr3.at[cur], g, prm, n_planes, s, ds,
                                pw2, tile_h, no_roll=ab_roll))
                            pl.when(~wd_c)(lambda: _accum_rows_strip(
                                scr3.at[cur], g, prm, n_planes, s, ds,
                                pw2, tile_h, no_roll=ab_roll,
                                narrow=True))
                        elif strip_pad:
                            _accum_rows_strip(scr3.at[cur], g, prm,
                                              n_planes, s, ds, pw2,
                                              tile_h, no_roll=ab_roll)
                        else:
                            _accum_rows(scr3.at[cur], g, prm, n_planes)

                    if not ab_write:
                        win_dma(a_c, cur, wd_c, write=True, wait=False)

                        # Cleanup: quiesce writes whose scheduled wait
                        # point lies beyond the last valid step.
                        @pl.when(c == n - 1)
                        def _():
                            win_dma(a_c, cur, wd_c, write=True,
                                    wait=True)

                            @pl.when((c >= 1) & ~hz1_c)
                            def _():
                                win_dma(a_m1, m1, wd_m1, write=True,
                                        wait=True)

                            @pl.when((c >= 2) & ~hz1_cm1 & ~hz2_c)
                            def _():
                                win_dma(a_m2, m2, wd_m2, write=True,
                                        wait=True)

    return kernel


# --------------------------------------------------------------------
# VMEM-resident variant (round 5): the whole padded field-plane stack
# of ONE frame lives in a VMEM scratch bank; drops accumulate into it
# with ordinary (8,128)-aligned dynamic loads/stores and the stack is
# written to HBM once per frame. This deletes the windowed kernel's
# per-drop read+write window DMAs and the entire RAW-hazard wait
# schedule. Motivation (round-5 DMA ablation, v5e): the 0.80 us
# per-valid-drop constant is ~72% window-DMA cost that is PER-TILE-RUN
# (~9.8 ns per (8-row x plane) run; narrow windows halve the BYTES at
# equal run count and measure neutral, and a tile_h sweep of DMA-only
# kernels scales linearly) — so shrinking transfers can't win; only
# removing them can. HBM traffic per frame drops from
# ~n_drops * 2 * window_bytes (~77 MB at KITTI 10 mm/hr) to one
# 13.7 MB stack write.
# --------------------------------------------------------------------

# VMEM budget for the resident stack(s): the hardware probe allocated
# and ran a 28.2 MB scratch bank on v5e (plus eval temporaries); the
# ceiling probe below (tools/kernel_ablation RESIDENT probes) refines
# this. The reserve covers the eval temporaries (~25 live
# (tile_h, 256) f32 buffers ~ 0.9 MB) plus compiler slack.
RESIDENT_VMEM_BUDGET = 30 * (1 << 20)
RESIDENT_EVAL_RESERVE = 4 * (1 << 20)


def resident_depth(n_planes: int, hp: int, wp: int,
                   budget: int = None) -> int:
    """Write-pipeline depth for the VMEM-resident kernel at this
    padded-plane size: 2 = double-banked (frame b+1 accumulates while
    frame b's stack flies to HBM), 1 = single bank (write waited at
    issue), 0 = stack does not fit VMEM — use the windowed kernel."""
    if budget is None:
        budget = RESIDENT_VMEM_BUDGET
    stack = n_planes * hp * wp * 4
    for d in (2, 1):
        if d * stack + RESIDENT_EVAL_RESERVE <= budget:
            return d
    return 0


def _accum_stack_full(stack_b, g, prm, n_planes, rows, kx, pw2):
    """stack_b[i, kx+t, rows, :] += contribution_i(g)'s lane tile t.

    The stack is LANE-TILED — (n_planes, NX, HP, 128) with the image
    column tile as a separate (dynamically indexed, non-minor) axis —
    because Mosaic legalizes a dynamic offset on the minormost axis of
    a big VMEM ref catastrophically (probe: ~14.7 us/drop and worker
    crashes under fori_loop vs 0.109 us/drop tiled)."""
    for i, contrib in enumerate(_plane_contribs(g, prm, n_planes)):
        for t in range(pw2 // LANE):
            ct = contrib[:, t * LANE:(t + 1) * LANE]
            w = stack_b[i, kx + t, rows, :]
            stack_b[i, kx + t, rows, :] = w + ct


def _accum_stack_strip(stack_b, g, prm, n_planes, s, ds, pw2, tile_h,
                       ay0, kx, narrow, no_roll: bool = False):
    """Strip-mode accumulate directly into the resident stack: same
    contribution stacking + placement rolls as _accum_rows_strip (see
    its docstring for the roll-safety argument), but the two static
    lane tiles of the scratch bank become the two dynamically indexed
    lane-tile slabs kx / kx+1 of the lane-tiled stack. ``narrow``: the
    caller proved the drop's nonzero content fits the single lane tile
    its anchor addresses (same contract as the windowed kernel's
    narrow DMA mode), so one unmasked add into slab kx places it."""
    assert pw2 == 2 * LANE, pw2
    the = g.shape[0]
    contribs = jnp.stack(_plane_contribs(g, prm, n_planes))
    if the < tile_h:
        contribs = jnp.pad(contribs,
                           ((0, 0), (0, tile_h - the), (0, 0)))
    flat = contribs.reshape(n_planes * tile_h, LANE)
    if no_roll:
        rolled = flat.reshape(n_planes, tile_h, LANE)
    else:
        if the < tile_h:
            flat = pltpu.roll(flat, ds, 0)
        rolled = pltpu.roll(flat, jnp.mod(s, LANE),
                            1).reshape(n_planes, tile_h, LANE)
    rows = pl.ds(ay0, tile_h)
    if narrow:
        for i in range(n_planes):
            w = stack_b[i, kx, rows, :]
            stack_b[i, kx, rows, :] = w + rolled[i]
        return
    j = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    for i in range(n_planes):
        w0 = stack_b[i, kx, rows, :]
        stack_b[i, kx, rows, :] = w0 + jnp.where(j >= s, rolled[i],
                                                 0.0)
        w1 = stack_b[i, kx + 1, rows, :]
        stack_b[i, kx + 1, rows, :] = w1 + jnp.where(j < s, rolled[i],
                                                     0.0)


def _make_kernel_resident(rung_meta, th, tw, n_planes, hp, wp,
                          bsz, depth, row_strip: bool, any_pair: bool,
                          sub: int = SUBLANE,
                          ablate: frozenset = frozenset()):
    """All-rung VMEM-resident kernel over grid (B, C_total).

    ``rung_meta``: static tuple of per-rung
    (off, cap, tile_h, pw2, n_tiles, strip_pad, pair, r_ranks,
    modes_y, modes_x) with offs = running capacity sums — the rung a
    step belongs to is a STATIC range test on c.

    Per frame: step 0 waits the frame-(b-depth) write-out of its bank
    (double-banked: the previous frame's stack flies to HBM while this
    frame accumulates into the other bank) and zeroes the bank; every
    valid drop step evaluates its patch (identical strip / row-strip /
    pair eval to the windowed kernel) and accumulates into the bank at
    its (8,128)-aligned window position; the last step copies the bank
    to out[b]. No per-drop DMAs, no RAW hazards: within a frame every
    accumulate is an ordinary VMEM RMW, ordered by program order.

    The stack is LANE-TILED — (n_planes, NX, hp, 128) — and the HBM
    output keeps that layout (the caller transposes back to
    (n_planes, hp, wp) in XLA): hardware probes showed Mosaic
    legalizes dynamic offsets on a big VMEM ref's minormost axis
    catastrophically (14.7 us/drop + fori_loop worker crashes), while
    the tiled form costs 0.109 us/drop; and a per-(plane, tile)
    relayout write-out crashes the Mosaic vector layout pass, so the
    write stays one contiguous copy."""
    ab_eval = "noeval" in ablate
    ab_roll = "noroll" in ablate
    ab_accum = "noaccum" in ablate
    ab_zero = "nozero" in ablate
    ab_write = "nowrite" in ablate
    n_rungs = len(rung_meta)
    nx = wp // LANE

    def kernel(nv_ref, ax_ref, ay_ref, wd_ref, prm_ref, ayc_ref,
               bxc_ref, *rest):
        if any_pair:
            (prm2_ref, ayc2_ref, bxc2_ref, out_ref, stack, stash,
             sems) = rest
        else:
            out_ref, stack, sems = rest
            stash = None
        b = pl.program_id(0)
        c = pl.program_id(1)
        ct = pl.num_programs(1)
        fi = b * ct + c

        def prm(k):
            return prm_ref[0, 0, 0, k]

        # ---- frame prologue: retire the bank's in-flight write, zero.
        @pl.when(c == 0)
        def _():
            for par in range(depth):
                @pl.when((b % depth) == par)
                def _(par=par):
                    if depth > 1 and not ab_write:
                        @pl.when(b >= depth)
                        def _():
                            pltpu.make_async_copy(
                                stack.at[par], out_ref.at[b - depth],
                                sems.at[par]).wait()
                    if not ab_zero:
                        # One giant assignment: measured ~free on v5e
                        # (probe5 zgiant), where 8-row-slab store
                        # loops cost ~40 us/frame.
                        stack[par] = jnp.zeros(
                            (n_planes, nx, hp, LANE), jnp.float32)

        # ---- drop steps, one static branch per rung.
        for ri, meta in enumerate(rung_meta):
            (off, cap, tile_h, pw2, n_tiles, strip_pad, pair,
             r_ranks, modes_y, modes_x) = meta

            @pl.when((c >= off) & (c < off + cap)
                     & ((c - off) < nv_ref[b * n_rungs + ri]))
            def _(off=off, cap=cap, tile_h=tile_h, pw2=pw2,
                  n_tiles=n_tiles, strip_pad=strip_pad, pair=pair,
                  r_ranks=r_ranks, modes_y=modes_y, modes_x=modes_x):
                ax = pl.multiple_of(ax_ref[fi], 128)
                ay0 = pl.multiple_of((ay_ref[fi] // sub) * sub, sub)
                if strip_pad:
                    the = tile_h - sub if row_strip else tile_h
                    s = jnp.clip(
                        jnp.floor(prm(P_MINCX)).astype(jnp.int32)
                        - strip_pad - ax, 0, pw2 - LANE)
                    ds = ay_ref[fi] - ay0 if row_strip else 0
                    if ab_eval:
                        g = jnp.zeros((the, LANE), jnp.float32)
                    elif pair:
                        # Identical pair scheme to the windowed kernel
                        # (see _make_kernel_pipelined PAIR MODE): even
                        # in-rung steps evaluate drops (c, c+1) in the
                        # lane halves into the stash; each step keeps
                        # its own half. Rung capacities are even and
                        # rung offsets even, so pairs never straddle a
                        # rung boundary.
                        lane = jax.lax.broadcasted_iota(
                            jnp.int32, (1, LANE), 1)
                        half = lane < (LANE // 2)
                        idx2 = jnp.minimum(fi + 1, b * ct + ct - 1)

                        @pl.when((c % 2) == (off % 2))
                        def _():
                            def prmv(k):
                                return jnp.where(
                                    half, prm_ref[0, 0, 0, k],
                                    prm2_ref[0, 0, 0, k])

                            def cyv(r, m):
                                return jnp.where(
                                    half, ayc_ref[0, 0, r, m],
                                    ayc2_ref[0, 0, r, m])

                            def cxv(r, m):
                                return jnp.where(
                                    half, bxc_ref[0, 0, r, m],
                                    bxc2_ref[0, 0, r, m])

                            ax2 = pl.multiple_of(ax_ref[idx2], 128)
                            ay02 = pl.multiple_of(
                                (ay_ref[idx2] // sub) * sub, sub)
                            s2 = jnp.clip(
                                jnp.floor(prm2_ref[0, 0, 0, P_MINCX]
                                          ).astype(jnp.int32)
                                - strip_pad - ax2, 0, pw2 - LANE)
                            ds2 = (ay_ref[idx2] - ay02 if row_strip
                                   else 0)
                            ox = jnp.where(half, ax + s,
                                           ax2 + s2 - LANE // 2)
                            oy = jnp.where(half, ay0 + ds, ay02 + ds2)
                            stash[0:the, :] = _patch_eval(
                                prmv, cyv, cxv, ox, oy, r_ranks,
                                modes_y, modes_x, th, tw, the, LANE)

                        keep = (lane // (LANE // 2)) == ((c - off) % 2)
                        g = jnp.where(keep, stash[0:the, :], 0.0)
                        s = jnp.where((c - off) % 2 == 0, s,
                                      s - LANE // 2)
                    else:
                        g = _patch_eval(
                            prm, lambda r, m: ayc_ref[0, 0, r, m],
                            lambda r, m: bxc_ref[0, 0, r, m],
                            ax + s, ay0 + ds, r_ranks, modes_y,
                            modes_x, th, tw, the, LANE)
                    if not ab_accum:
                        wd = wd_ref[fi] != 0
                        kx = ax // LANE
                        for par in range(depth):
                            @pl.when((b % depth) == par)
                            def _(par=par):
                                pl.when(wd)(
                                    lambda: _accum_stack_strip(
                                        stack.at[par], g, prm,
                                        n_planes, s, ds, pw2, tile_h,
                                        ay0, kx, narrow=False,
                                        no_roll=ab_roll))
                                pl.when(~wd)(
                                    lambda: _accum_stack_strip(
                                        stack.at[par], g, prm,
                                        n_planes, s, ds, pw2, tile_h,
                                        ay0, kx, narrow=True,
                                        no_roll=ab_roll))
                else:
                    # Full-window eval (big rungs), row tile by row
                    # tile — no pipelining needed: there are no DMAs
                    # to hide.
                    kx = ax // LANE
                    for t in range(n_tiles):
                        if ab_eval:
                            g = jnp.zeros((tile_h, pw2), jnp.float32)
                        else:
                            g = _patch_eval(
                                prm, lambda r, m: ayc_ref[0, 0, r, m],
                                lambda r, m: bxc_ref[0, 0, r, m],
                                ax, ay0 + t * tile_h, r_ranks,
                                modes_y, modes_x, th, tw, tile_h, pw2)
                        if not ab_accum:
                            rows = pl.ds(ay0 + t * tile_h, tile_h)
                            for par in range(depth):
                                @pl.when((b % depth) == par)
                                def _(par=par, g=g, rows=rows):
                                    _accum_stack_full(
                                        stack.at[par], g, prm,
                                        n_planes, rows, kx, pw2)

        # ---- frame epilogue: write the bank out.
        if not ab_write:
            @pl.when(c == ct - 1)
            def _():
                for par in range(depth):
                    @pl.when((b % depth) == par)
                    def _(par=par):
                        cp = pltpu.make_async_copy(
                            stack.at[par], out_ref.at[b],
                            sems.at[par])
                        cp.start()
                        if depth == 1:
                            cp.wait()

                # Final frame: retire every in-flight write (an
                # unwaited DMA semaphore wedges the device).
                if depth > 1:
                    @pl.when(b == bsz - 1)
                    def _():
                        if bsz >= 2:
                            oth = (bsz - 2) % depth
                            pltpu.make_async_copy(
                                stack.at[oth], out_ref.at[b - 1],
                                sems.at[oth]).wait()
                        own = (bsz - 1) % depth
                        pltpu.make_async_copy(
                            stack.at[own], out_ref.at[b],
                            sems.at[own]).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_planes", "bspecs", "tex_hw", "hp", "wp",
                     "row_strip", "pair_eval", "depth", "interpret",
                     "ablate"))
def fused_raster_composite_resident(
        params_list,    # tuple of (B, N_PARAMS, C_r) f32 per rung
        anchor_list,    # tuple of (B, C_r, 2) int32 (raw)
        wide_list,      # tuple of (B, C_r) int32
        ayc_list,       # tuple of (B, C_r, R_r, My_r)
        bxc_list,       # tuple of (B, C_r, R_r, Mx_r)
        n_valid,        # (B, n_rungs) int32
        *, n_planes: int, bspecs, tex_hw, hp: int, wp: int,
        row_strip: bool = True, pair_eval: bool = True,
        depth: int = 2, interpret: bool = False, ablate: str = ""):
    """Run ALL rungs through the VMEM-resident kernel in ONE
    pallas_call. Accumulation math and order are identical to calling
    fused_raster_composite rung by rung (rung-major, slot-minor), so
    the result is bit-exact vs the windowed kernel. f32 planes only
    (the resident stack is f32 VMEM; callers wanting bf16 planes use
    the windowed kernel). Returns (B, n_planes, hp, wp) f32 planes —
    there is no `fields` input: the stack is zeroed in VMEM.

    ``wide_list``: per-drop containment flags from
    ops.rasterize.raster_params_frame — 0 marks a strip drop whose
    content + tails fit the single lane tile its anchor addresses,
    which accumulates with ONE unmasked tile add instead of two
    masked ones (pure VPU saving here; no DMA meaning).
    """
    assert n_planes in (5, 8), n_planes
    assert depth in (1, 2), depth
    sub = SUBLANE
    bsz = params_list[0].shape[0]
    n_rungs = len(bspecs)
    th, tw = tex_hw

    plans = [plan_window(b.ph, b.pw, sub) for b in bspecs]
    caps = [p.shape[-1] for p in params_list]
    offs = [0]
    for cp_ in caps[:-1]:
        offs.append(offs[-1] + cp_)
    c_tot = sum(caps)
    r_max = max(a.shape[2] for a in ayc_list)

    rung_meta = []
    any_pair = False
    for bi, (bspec, plan) in enumerate(zip(bspecs, plans)):
        ph2, pw2, tile_h, n_tiles = plan
        strip = bucket_strip_pad(bspec.ph, bspec.pw, bspec.radius, sub)
        if strip and pw2 <= LANE:
            strip = 0
        pair = (bool(pair_eval) and strip > 0
                and bspec.pw + 2 * strip <= LANE // 2)
        if pair:
            # Pairs must not straddle rung boundaries: the stash is
            # shared between steps c (even in-rung) and c+1.
            assert caps[bi] % 2 == 0 and offs[bi] % 2 == 0, (
                caps, offs, bi)
            any_pair = True
        rung_meta.append((offs[bi], caps[bi], tile_h, pw2, n_tiles,
                          strip, pair,
                          ayc_list[bi].shape[2], ayc_list[bi].shape[3],
                          bxc_list[bi].shape[3]))
    rung_meta = tuple(rung_meta)

    def pad_coef(a):
        # (B, C_r, R_r, M_r) -> (B, C_r, r_max, LANE-padded modes)
        mp = -(-a.shape[3] // LANE) * LANE
        return jnp.pad(a, ((0, 0), (0, 0), (0, r_max - a.shape[2]),
                           (0, mp - a.shape[3])))

    ayc_all = jnp.concatenate([pad_coef(a) for a in ayc_list], axis=1)
    bxc_all = jnp.concatenate([pad_coef(a) for a in bxc_list], axis=1)
    params = jnp.concatenate(list(params_list), axis=2)
    prm = jnp.pad(params.transpose(0, 2, 1),
                  ((0, 0), (0, 0), (0, LANE - N_PARAMS)))[:, :, None, :]
    anchor = jnp.concatenate(list(anchor_list), axis=1)
    ax = ((anchor[..., 0] // LANE) * LANE).reshape(-1)
    ay = anchor[..., 1].reshape(-1)
    wd = jnp.concatenate(list(wide_list), axis=1).astype(
        jnp.int32).reshape(-1)

    myp = ayc_all.shape[3]
    mxp = bxc_all.shape[3]

    kernel = _make_kernel_resident(
        rung_meta, th, tw, n_planes, hp, wp, bsz, depth,
        row_strip=row_strip, any_pair=any_pair, sub=sub,
        ablate=frozenset(ablate.split("+")) - {""} if ablate
        else frozenset())

    per_drop_specs = [
        pl.BlockSpec((1, 1, 1, LANE), lambda b, i, *_: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, r_max, myp), lambda b, i, *_: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, r_max, mxp), lambda b, i, *_: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [prm, ayc_all, bxc_all]
    if any_pair:
        def _next(b, i, *_):
            return (b, jnp.minimum(i + 1, c_tot - 1), 0, 0)
        per_drop_specs += [
            pl.BlockSpec((1, 1, 1, LANE), _next,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r_max, myp), _next,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r_max, mxp), _next,
                         memory_space=pltpu.VMEM),
        ]
        operands += [prm, ayc_all, bxc_all]

    max_the = max((m[2] - (sub if row_strip else 0))
                  for m in rung_meta if m[6]) if any_pair else 0
    nx = wp // LANE
    scratch_shapes = [
        pltpu.VMEM((depth, n_planes, nx, hp, LANE), jnp.float32),
    ] + ([pltpu.VMEM((max_the, LANE), jnp.float32)]
         if any_pair else []) + [
        pltpu.SemaphoreType.DMA((depth,)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bsz, c_tot),
        in_specs=per_drop_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_planes, nx, hp, LANE),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # Generous compiler ceiling (the probes ran under 64 MB);
            # which configs take this path is decided by
            # resident_depth against RESIDENT_VMEM_BUDGET, not here.
            vmem_limit_bytes=96 * 1024 * 1024,
            has_side_effects=True),
        interpret=interpret,
    )(n_valid.astype(jnp.int32).reshape(-1), ax, ay, wd, *operands)
    # Untile: (B, P, NX, hp, 128) -> (B, P, hp, wp). One XLA relayout
    # pass; fuses into / is amortized by the downstream crop+blend
    # reads. (A per-(plane, tile) DMA relayout inside the kernel
    # crashes the Mosaic vector-layout pass — probe5.)
    return jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(
        bsz, n_planes, hp, wp)


@functools.partial(
    jax.jit,
    static_argnames=("window_hw", "tex_hw", "strip_pad", "row_strip",
                     "pair", "interpret", "ablate"))
def fused_raster_composite(params: jnp.ndarray,    # (B, N_PARAMS, C) f32
                           anchor: jnp.ndarray,    # (B, C, 2) int32 (raw)
                           ayc: jnp.ndarray,       # (B, C, R, My) damped
                           bxc: jnp.ndarray,       # (B, C, R, Mx)
                           n_valid: jnp.ndarray,   # (B,) int32
                           fields: jnp.ndarray,    # (B, 5|8, HP, WP) f32/bf16
                           window_hw,              # static (PH2, PW2)
                           tex_hw,                 # static (TH, TW)
                           strip_pad: int = 0,     # static, 0 = off
                           row_strip: bool = True,  # static
                           pair: bool = False,      # static
                           interpret: bool = False,
                           ablate: str = "",        # static, tools only
                           wide=None):  # (B, C) int32, None = all wide
    """Run the fused kernel for one bucket. Anchors are raw (pre-clip
    [0,W]x[0,H]); tile alignment happens here (coordinates shift inside
    the kernel, so no patch pre-shifting is needed). ``fields`` stacks
    the planes (alpha, log_att, add_r, add_g, add_b[, sat_r, sat_g,
    sat_b]) on axis 1 — 8 planes enable the saturation-mask
    accumulation; the stacked layout lets one strided DMA descriptor
    move a whole window (5-8x fewer descriptors than per-plane
    copies).

    ``wide`` (narrow DMA mode, round 5; strip buckets only): per-drop
    0/1 flags — 0 marks a drop whose content + erf tails fit entirely
    inside the single 128-lane tile its anchor addresses (caller
    contract: anchor_x = clip(floor(mincx) - strip_pad, 0, W) and
    (anchor_x %% 128) + pw + 2*strip_pad <= 128), whose window DMAs
    then move HALF the bytes. Pass None to disable (all windows
    wide)."""
    n_planes = fields.shape[1]
    assert n_planes in (5, 8), n_planes
    bsz, _, c = params.shape
    r_ranks, modes_y = ayc.shape[2], ayc.shape[3]
    modes_x = bxc.shape[3]
    ph2, pw2, tile_h, n_tiles = window_hw
    hp, wp = fields.shape[2:]
    dtype = fields.dtype

    # bf16 planes double the sublane tile: window row starts/sizes must
    # be 16-aligned (the caller's plan_window(sublane=16) guarantees
    # tile_h). ax is aligned here; ay is passed RAW — the kernels align
    # it themselves, and the pipelined kernel's row strip needs the
    # true content row start.
    sub = 16 if dtype == jnp.bfloat16 else SUBLANE
    assert tile_h % sub == 0, (tile_h, sub)
    ax = (anchor[..., 0] // LANE) * LANE
    ay = anchor[..., 1]

    # Lane-pad the mode axes so VMEM blocks are tileable.
    myp = -(-modes_y // LANE) * LANE
    mxp = -(-modes_x // LANE) * LANE
    ayc_p = jnp.pad(ayc, ((0, 0), (0, 0), (0, 0), (0, myp - modes_y)))
    bxc_p = jnp.pad(bxc, ((0, 0), (0, 0), (0, 0), (0, mxp - modes_x)))
    # (B, C, 1, LANE) param lane per drop, VMEM-blocked per grid step
    # (the extra unit dim keeps the block's sublane dim == array dim).
    prm = jnp.pad(params.transpose(0, 2, 1),
                  ((0, 0), (0, 0), (0, LANE - N_PARAMS)))[:, :, None, :]

    if n_tiles == 1:
        # Hot path: double-buffered pipelined kernel (see
        # _make_kernel_pipelined) — DMA latency hides under compute.
        if strip_pad and pw2 <= LANE:
            strip_pad = 0   # window is already one lane-tile wide
        pair = bool(pair) and strip_pad > 0
        narrow = wide is not None and strip_pad > 0
        kernel = _make_kernel_pipelined(
            r_ranks, modes_y, modes_x, tex_hw[0], tex_hw[1], n_planes,
            strip_pad=strip_pad, sub=sub, row_strip=row_strip,
            pair=pair, narrow=narrow,
            ablate=frozenset(ablate.split("+")) - {""} if ablate
            else frozenset())
        the = tile_h - sub if row_strip else tile_h
        scratch_shapes = [
            pltpu.VMEM((3, n_planes, tile_h, pw2), dtype),
        ] + ([pltpu.VMEM((the, LANE), jnp.float32)] if pair else []) + [
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
        ]
    else:
        assert not ablate, "ablate targets the single-tile pipelined kernel"
        pair = False
        kernel = _make_kernel(r_ranks, modes_y, modes_x, tex_hw[0],
                              tex_hw[1], n_tiles, n_planes, sub=sub)
        scratch_shapes = [
            pltpu.VMEM((2, n_planes, tile_h, pw2), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    per_drop_specs = [
        pl.BlockSpec((1, 1, 1, LANE), lambda b, i, *_: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, r_ranks, myp),
                     lambda b, i, *_: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, r_ranks, mxp),
                     lambda b, i, *_: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if pair:
        # Pair mode also streams drop c+1's params/coefs (clamped at
        # the frame's last slot): the same arrays, blocked one step
        # ahead. ~4 KB/step of extra VMEM traffic vs the ~160 KB
        # window DMA.
        def _next(b, i, *_):
            return (b, jnp.minimum(i + 1, c - 1), 0, 0)
        per_drop_specs += [
            pl.BlockSpec((1, 1, 1, LANE), _next,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r_ranks, myp), _next,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r_ranks, mxp), _next,
                         memory_space=pltpu.VMEM),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bsz, c),
        in_specs=per_drop_specs + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch_shapes,
    )
    operands = [prm, ayc_p, bxc_p]
    if pair:
        operands += [prm, ayc_p, bxc_p]
    wd = (jnp.ones((bsz, c), jnp.int32) if wide is None
          else wide.astype(jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_planes, hp, wp),
                                       dtype),
        input_output_aliases={(10 if pair else 7): 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(n_valid.astype(jnp.int32), ax.reshape(-1), ay.reshape(-1),
      wd.reshape(-1), *operands, fields)
    return out
