"""Fused separable stencil blur: one Pallas pass over (N, H, W) planes.

The XLA banded-matmul blur (ops.blur._blocked_axis_blur) is exact on
CPU but HBM-bound on TPU at full-frame fog shapes: per axis it
materializes the overlapping slab stack, the einsum result, and a
layout-restoring transpose — ~14 HBM passes for 50 real MACs/pixel,
measured 11.8 ms of the 13.4 ms fog stage at the headline config
(batch 48, KITTI, 25-tap sigma-25 kernel, reference
``add_attenuation.py:79-80``). Worse, its default-precision f32
matmuls truncate operands to bf16 on TPU (measured 1.2e-3 vs a float64
reference at the fog kernel).

This kernel does BOTH axes in one visit. Per (plane, row-band,
lane-group) grid step it DMAs one (tile_h + 2r, w_out + 256) halo
block and applies both stencils as band matmuls on the MXU:

- row stencil in 128-row chunks: a (128, 128 + ceil8(2r)) band matrix
  against aligned sublane slices of the block (chunking keeps the
  dense band contraction close to the 2r+1 useful taps);
- column stencil per output lane tile: a (384, 128) band matrix with
  the halo offset folded into the band, against aligned lane slices.

Both matmuls use a split-float bf16 decomposition (``_split_dot``:
Mosaic's plain f32 dot truncates operands to bf16 single-pass, 7e-4
relative, same as XLA; the 4-pass split keeps ~2e-6 — MORE accurate
than the XLA path on TPU) and run at the bf16 MXU rate. Traffic is
~1.8x input + 1x output; reads are triple-buffered, writes
double-buffered, so DMA latency hides under the matmuls.

Measured trail on v5e (fog shape, 192 x 375 x 1242):
- 2r+1 shifted VPU FMAs: 20.4 ms (misaligned sublane/lane slices each
  cost a relayout);
- MXU band matmuls, 640-lane windows, depth-2: 13.9 ms;
- this version (full-width contiguous bands, depth-3): 11.6 ms vs the
  XLA blur's 11.9 — BUT a compute-free DMA-only variant measures
  10.0 ms, i.e. the Pallas DMA path itself is the floor here (~95
  GB/s effective on this device/toolchain vs the >400 GB/s the XLA
  blur's fused passes reach). The kernel therefore ships as an
  ACCURACY option (2.2e-6 vs f64 against XLA's 1.2e-3), not a speed
  win: production fog keeps the in-vmap XLA blur (render.frame.
  fused_field_planes note), and this stays available via
  fog_rain_layer(use_pallas_blur=True) / render.frame.batched_fog.

Borders are REFLECT_101 (cv2 default), folded into the padded input
the wrapper builds (``jnp.pad mode='reflect'`` IS 101-style), so the
kernel body has no edge cases: image col c lives at padded lane
128 + c, image row t at padded row r + t.

Alignment notes (CLAUDE.md landmines): every HBM window starts at
(8, 128)-aligned offsets with (8, 128)-multiple sizes by construction
— row starts i*tile_h (tile_h % 8 == 0), lane starts w_out*g
(w_out % 128 == 0), block (tile_h + ceil8(2r), w_out + 256).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
# Row-chunk height for the row-stencil band matmul: the dense band
# contraction costs (chunk + 2r) MACs per output pixel, so small
# chunks stay near the 2r+1 useful taps; 128 keeps the MXU M dim full.
ROW_CHUNK = 128
# Scratch budget for the full-width bands: 3 read banks of
# (ROW_CHUNK + ceil8(2r), W + 256) f32 plus 2 write banks of
# (ROW_CHUNK, ceil128(W)) must stay well under the ~16 MiB VMEM;
# pallas_blur_supported checks the JOINT (r, w) footprint against this
# (a fixed max width alone under-counts at large radii). 10 MiB keeps
# the historical r=12 envelope (w <= ~3300) with headroom for the
# compiler's own buffers.
VMEM_BLUR_BUDGET = 10 * (1 << 20)


def _ceil8(v: int) -> int:
    return -(-v // 8) * 8


def _pick_tile_h(h: int) -> int:
    """Row-band height: ROW_CHUNK keeps the MXU M dim full while the
    band stays a single contiguous DMA; short images use one band."""
    return _ceil8(h) if h <= ROW_CHUNK else ROW_CHUNK


def _split_bf16(m: np.ndarray):
    """Split-float decomposition: m == hi + lo with both bf16."""
    hi = np.asarray(m, np.float32).astype(jnp.bfloat16)
    lo = (np.asarray(m, np.float32)
          - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def _split_val(v):
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_dot(a, b):
    """Exact-to-f32 matmul from bf16 operand pairs: all four cross
    terms accumulate in f32 on the MXU. Mosaic's f32 dot truncates
    operands to bf16 single-pass (measured 7e-4 relative on v5e —
    same as XLA's default-precision matmul); the 4-pass split keeps
    ~2e-6 while running at the bf16 MXU rate."""
    (ahi, alo), (bhi, blo) = a, b
    f32 = jnp.float32
    return (jnp.dot(ahi, bhi, preferred_element_type=f32)
            + jnp.dot(ahi, blo, preferred_element_type=f32)
            + jnp.dot(alo, bhi, preferred_element_type=f32)
            + jnp.dot(alo, blo, preferred_element_type=f32))


def _make_blur_kernel(th: int, thr: int, nh: int, nwg: int, r: int,
                      w_out: int, w_blk: int, rs: int):
    n_chunks = -(-th // rs)
    n_tiles = w_out // LANE
    pad2r = _ceil8(2 * r)

    def kernel(rhi_ref, rlo_ref, chi_ref, clo_ref,
               xp_ref, out_ref, in3, out2, sem_r, sem_w):
        s = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def coords(st):
            g = jax.lax.rem(st, nwg)
            rest = jax.lax.div(st, nwg)
            return jax.lax.div(rest, nh), jax.lax.rem(rest, nh), g

        def read_copy(st, bank):
            n, i, g = coords(st)
            return pltpu.make_async_copy(
                xp_ref.at[n,
                          pl.ds(pl.multiple_of(i * th, SUBLANE), thr),
                          pl.ds(pl.multiple_of(g * w_out, LANE),
                                w_blk)],
                in3.at[bank], sem_r.at[bank])

        def write_copy(st, bank):
            n, i, g = coords(st)
            return pltpu.make_async_copy(
                out2.at[bank],
                out_ref.at[n,
                           pl.ds(pl.multiple_of(i * th, SUBLANE), th),
                           pl.ds(pl.multiple_of(g * w_out, LANE),
                                 w_out)],
                sem_w.at[bank])

        cur3 = jax.lax.rem(s, 3)
        cur2 = jax.lax.rem(s, 2)

        # Triple-buffered reads: two in flight ahead of the compute.
        @pl.when(s == 0)
        def _():
            read_copy(0, 0).start()

            @pl.when(nsteps >= 2)
            def _():
                read_copy(1, 1).start()

        @pl.when(s + 2 < nsteps)
        def _():
            # Bank (s+2)%3 was read by step s-1's compute — done.
            read_copy(s + 2, jax.lax.rem(s + 2, 3)).start()

        read_copy(s, cur3).wait()

        rsub = (rhi_ref[...], rlo_ref[...])
        csub = (chi_ref[...], clo_ref[...])

        # The out bank is reused every 2 steps: its previous write
        # (step s-2) must have landed before overwriting.
        @pl.when(s >= 2)
        def _():
            write_copy(s - 2, cur2).wait()

        for c in range(n_chunks):
            c0 = c * rs
            csz = min(rs, th - c0)
            blk_c = _split_val(in3[cur3, c0:c0 + csz + pad2r, :])
            acc = _split_val(_split_dot(
                (rsub[0][:csz, :csz + pad2r],
                 rsub[1][:csz, :csz + pad2r]), blk_c))
            for t in range(n_tiles):
                out2[cur2, c0:c0 + csz, t * LANE:(t + 1) * LANE] = (
                    _split_dot((acc[0][:, t * LANE:t * LANE + 3 * LANE],
                                acc[1][:, t * LANE:t * LANE + 3 * LANE]),
                               csub))

        write_copy(s, cur2).start()

        # Epilogue: the kernel must not end with writes in flight.
        @pl.when(s == nsteps - 1)
        def _():
            write_copy(s, cur2).wait()

            @pl.when(s >= 1)
            def _():
                write_copy(s - 1, 1 - cur2).wait()

    return kernel


# Engage the fused kernel only where the XLA path measurably loses
# (full-frame stacks); small maps (envmap feather on CPU-size inputs)
# keep the matmul path.
MIN_PALLAS_ELEMS = 1 << 21


def pallas_blur_supported(shape, r: int) -> bool:
    """Shapes the fused kernel handles correctly AND within its VMEM
    envelope: radius within one lane tile's halo, no multi-fold
    reflection, full-width bands that fit the scratch budget."""
    if len(shape) != 3:
        return False
    n, h, w = shape
    if not (1 <= r <= 64 and r < h and r < w):
        return False
    th = ROW_CHUNK            # upper bound: _pick_tile_h(h) <= ROW_CHUNK
    read = 3 * (th + _ceil8(2 * r)) * (w + 2 * LANE) * 4
    write = 2 * th * (-(-w // LANE) * LANE) * 4
    return read + write <= VMEM_BLUR_BUDGET


def pallas_blur_profitable(shape) -> bool:
    """Whether the fused kernel is worth its fixed costs (callers keep
    the XLA matmul path for small maps like the envmap feather)."""
    n, h, w = shape
    return n * h * w >= MIN_PALLAS_ELEMS


def _blur_call(x, taps_np, interpret):
    n, h, w = x.shape
    r = (taps_np.shape[0] - 1) // 2
    pad2r = _ceil8(2 * r)

    th = _pick_tile_h(h)
    nh = -(-h // th)
    ho = nh * th
    thr = th + pad2r
    wo = -(-w // LANE) * LANE
    # FULL-WIDTH bands: the block covers every padded lane, so each
    # read/write is ONE contiguous HBM transfer. (The first geometry
    # used 640-lane windows: a (408, 640) window of a 1664-lane array
    # is 408 separate 2.5 KB row strides, and a compute-free variant
    # of the kernel still took 10.9 of its 12.6 ms — the strided
    # window DMA, not the math, was the whole cost.)
    w_out = wo
    w_blk = wo + 2 * LANE
    nwg = 1
    wo_env = wo
    wp = w_blk
    rs = min(ROW_CHUNK, th)

    # REFLECT_101 pad (jnp 'reflect' excludes the edge, like cv2),
    # then zero-pad to the aligned envelope: image row t -> padded row
    # r + t, image col c -> padded lane 128 + c.
    x1 = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="reflect")
    xp = jnp.pad(x1, ((0, 0),
                      (0, ho + pad2r - (h + 2 * r)),
                      (LANE - r, wp - (w + 2 * r) - (LANE - r))))

    # Static band matrices, split-float bf16 pairs. Row stencil: out
    # row t of a chunk = sum_k w_k blk[t + k]. Column stencil: out
    # lane o of tile t = sum_k w_k acc[128*t + (128 - r) + o + k],
    # applied to the aligned 3-tile slice acc[:, 128t : 128t + 384].
    n_taps = taps_np.shape[0]
    R = np.zeros((rs, rs + pad2r), np.float32)
    for k in range(n_taps):
        R[np.arange(rs), np.arange(rs) + k] = taps_np[k]
    C = np.zeros((3 * LANE, LANE), np.float32)
    for k in range(n_taps):
        C[(LANE - r) + np.arange(LANE) + k, np.arange(LANE)] = taps_np[k]
    rhi, rlo = _split_bf16(R)
    chi, clo = _split_bf16(C)

    kernel = _make_blur_kernel(th, thr, nh, nwg, r, w_out, w_blk, rs)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n * nh * nwg,),
        in_specs=[const_spec, const_spec, const_spec, const_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo_env), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, thr, w_blk), jnp.float32),
            pltpu.VMEM((2, th, w_out), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.asarray(rhi), jnp.asarray(rlo), jnp.asarray(chi),
      jnp.asarray(clo), xp)
    return out[:, :h, :w]


def _host_blur_f64(xn: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Float64 NumPy separable blur with REFLECT_101 — the gate's
    ground truth. Deliberately NOT the XLA banded-matmul blur: XLA's
    default-precision f32 matmuls truncate inputs to bf16 on TPU
    (~1e-3 error at the fog kernel), so the XLA path is the LESS
    accurate one on hardware and would wrongly fail an exact kernel."""
    r = (kernel.shape[0] - 1) // 2
    h, w = xn.shape[-2:]
    xp = np.pad(xn.astype(np.float64), ((0, 0), (r, r), (r, r)),
                mode="reflect")
    k64 = kernel.astype(np.float64)
    rows = sum(t * xp[:, i:i + h] for i, t in enumerate(k64))
    return sum(t * rows[:, :, i:i + w] for i, t in enumerate(k64))


# Process-level cache of the hardware value gate (same discipline as
# render.frame.resolve_kernel_modes: a Mosaic miscompile must downgrade
# to the proven XLA path, never silently mis-render).
_BLUR_GATE: dict = {}


def pallas_blur_ok() -> bool:
    """Value-gate the fused blur on the current backend, once per
    process: compiled Pallas vs a host float64 reference on a small
    random stack. Non-TPU backends always use the XLA path.

    TRACE-SAFE: the gate render cannot run while jax is tracing (a
    nested jit inlines into the trace and the np comparison sees
    tracers), so inside a trace an unresolved gate conservatively
    reports False. Production entry points resolve it eagerly via
    render.frame.resolve_kernel_modes before building any jit."""
    if jax.default_backend() != "tpu":
        return False
    if "ok" not in _BLUR_GATE:
        try:  # private API; a jax upgrade moving it must not break the gate
            from jax._src.core import trace_state_clean
            clean = trace_state_clean()
        except Exception:
            clean = False  # undeterminable -> conservatively "tracing"
        if not clean:
            return False
    if "ok" not in _BLUR_GATE:
        from raintpu.ops.blur import cv2_gaussian_kernel
        try:
            k = cv2_gaussian_kernel(25, 25.0)
            rng = np.random.RandomState(0)
            # h > ROW_CHUNK so the gate compiles a MULTI-band grid
            # (nh > 1) — the band-offset DMA indexing is exactly what
            # a Mosaic miscompile would get wrong; a single-band probe
            # would never exercise it.
            xn = rng.rand(2, 200, 256).astype(np.float32)
            ref = _host_blur_f64(xn, k)
            out = np.asarray(jax.jit(
                lambda v: separable_blur_pallas(v, k))(jnp.asarray(xn)))
            diff = float(np.max(np.abs(ref - out)))
            ok, err = diff < 2e-5, f"max diff vs f64 {diff:.2e}"
        except Exception as e:  # compile/runtime failure = unusable
            ok, err = False, f"{type(e).__name__}: {e}"
        if not ok:
            from raintpu.utils.logging import print_warning
            print_warning(
                "pallas blur kernel diverged from the f64 reference on "
                "this backend (%s); falling back to the banded-matmul "
                "path" % err)
        _BLUR_GATE["ok"] = ok
    return _BLUR_GATE["ok"]


def separable_blur_pallas(x: jnp.ndarray, kernel: np.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused-stencil separable blur of (N, H, W) f32 planes with one
    static odd-length 1-D kernel, REFLECT_101 borders — value-matched
    to ops.blur.separable_blur_hw within the split-float residual
    (~1e-5; on TPU hardware this path is ~500x MORE accurate than the
    XLA blur, whose matmuls truncate to bf16). Callers gate via
    :func:`pallas_blur_supported` / :func:`pallas_blur_profitable`.
    """
    ksize = kernel.shape[0]
    assert ksize % 2 == 1, ksize
    r = (ksize - 1) // 2
    assert pallas_blur_supported(x.shape, r), (x.shape, r)
    return _blur_call(x.astype(jnp.float32),
                      np.asarray(kernel, np.float32), interpret)
