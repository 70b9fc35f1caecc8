"""Device-mesh scaling: data-parallel frames x drop-parallel compositing.

The reference scales by farming ``main.py`` subprocesses over CPU cores
with filesystem coordination (``main_threaded.py``; SURVEY.md §2
parallelism table). The TPU-native equivalent is SPMD over a
``jax.sharding.Mesh`` with two axes:

- ``dp`` (data parallel): frames are independent — the batch dim shards
  with no communication at all.
- ``sp`` (streak parallel): within a frame, the drop population shards
  across devices; each device rasterizes + accumulates its drop subset
  into local field maps, and one ``psum`` over ``sp`` reduces them
  (the compositing algebra in ops/composite is an order-independent sum
  by construction, which is what makes this a single collective).
  The per-drop FOV photometry matmuls shard the same way.

Multi-host: build the mesh over ``jax.devices()`` spanning hosts and
feed per-host shards (``jax.make_array_from_process_local_data``);
collectives ride ICI within a pod slice. There is no cross-frame state,
so elasticity / fault tolerance reduces to the same idempotent
file-keyed work units the reference uses (kept in render/pipeline).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from raintpu.particles.schema import DropBatch
from raintpu.render import frame as frame_mod
from raintpu.render.frame import FrameOutput, PipelineConfig


def make_mesh(n_devices: Optional[int] = None,
              sp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, sp) mesh over the available devices.

    sp divides the device count; dp = n_devices // sp.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % sp == 0, f"sp={sp} must divide device count {n}"
    dp = n // sp
    dev_array = np.asarray(devices).reshape(dp, sp)
    return Mesh(dev_array, axis_names=("dp", "sp"))


_sharded_cache = {}
_SHARDED_CACHE_MAX = 16


def render_frames_sharded(mesh: Mesh,
                          bg: jnp.ndarray,
                          depth: jnp.ndarray,
                          drops: DropBatch,
                          textures,
                          bin_edges: jnp.ndarray,
                          keys: jax.Array,
                          cfg: PipelineConfig) -> FrameOutput:
    """Batched render sharded (frames over dp) x (drops over sp).

    bg/depth/keys: leading batch dim B (divisible by mesh dp size);
    drops: DropBatch with dims (B, N, ...), N divisible by sp size.

    Per-device work: B/dp frames x N/sp drops. Communication: one psum
    of the field maps over sp (zero when sp == 1). The compiled sharded
    step is cached per (mesh, cfg, backend) with a bounded LRU so
    repeated calls don't re-trace.

    The field accumulation backend follows ``cfg.composite_mode``
    exactly like the unsharded path: the fused Pallas raster+composite
    kernel when resolved to "fused" (the 542 img/s single-chip path;
    requires ``textures`` to be a TextureBank), the XLA composite
    otherwise (CPU/golden fallback). On non-TPU backends the fused
    kernel runs in interpret mode, which bit-matches XLA.
    """
    mode = cfg.resolved_composite_mode()
    fused = mode == "fused" and hasattr(textures, "ay")
    cache_key = (tuple(mesh.devices.flat), mesh.devices.shape,
                 mesh.axis_names, cfg, fused)
    fn = _sharded_cache.pop(cache_key, None)
    if fn is None:
        fn = _build_sharded_fused(mesh, cfg) if fused \
            else _build_sharded(mesh, cfg)
        while len(_sharded_cache) >= _SHARDED_CACHE_MAX:
            _sharded_cache.pop(next(iter(_sharded_cache)))
    _sharded_cache[cache_key] = fn  # re-insert = LRU touch
    return fn(bg, depth, drops, textures, bin_edges, keys)


def _drop_in_specs():
    data_spec = P("dp")
    drop_spec = jax.tree.map(lambda _: P("dp", "sp"),
                             DropBatch(*([0] * 11)))
    return (data_spec, data_spec, drop_spec, P(), P(), data_spec)


def _build_sharded(mesh: Mesh, cfg: PipelineConfig):
    @partial(jax.shard_map, mesh=mesh,
             in_specs=_drop_in_specs(),
             out_specs=jax.tree.map(lambda _: P("dp"), _out_treedef(cfg)),
             check_vma=False)
    def _run(bg_l, depth_l, drops_l, tex, edges, keys_l):
        sp_idx = jax.lax.axis_index("sp")
        n_local = drops_l.ip1.shape[1]

        def one(b, d, dr, k):
            fogged, env_photo, env_save = frame_mod.frame_background(
                b, d, cfg)
            # Per-drop RNG keyed by global drop index -> results are
            # bit-identical for any sp layout.
            fields, overflow = frame_mod.drop_fields(
                env_photo, dr, tex, edges, k, cfg,
                drop_offset=sp_idx * n_local)
            fields = jax.tree.map(
                lambda x: jax.lax.psum(x, "sp"), fields)
            overflow = jax.lax.psum(overflow, "sp")
            return frame_mod.finalize_frame(b, fogged, fields, env_save,
                                            overflow, cfg)

        return jax.vmap(one)(bg_l, depth_l, drops_l, keys_l)

    return jax.jit(_run)


def _build_sharded_fused(mesh: Mesh, cfg: PipelineConfig):
    """Sharded step backed by the fused Pallas raster+composite kernel.

    Each device runs the fused kernel over its (local frames x local
    drops) shard into padded field planes; a single psum over ``sp``
    reduces the planes (they are order-independent sums), then each
    device finalizes its own frames. This brings the sharded path to
    the same per-drop cost as the single-chip flagship path instead of
    the XLA scatter composite.
    """
    interpret = jax.default_backend() != "tpu"

    @partial(jax.shard_map, mesh=mesh,
             in_specs=_drop_in_specs(),
             out_specs=jax.tree.map(lambda _: P("dp"), _out_treedef(cfg)),
             check_vma=False)
    def _run(bg_l, depth_l, drops_l, tex, edges, keys_l):
        sp_idx = jax.lax.axis_index("sp")
        n_local = drops_l.ip1.shape[1]
        fogged, env_save, planes, overflow = frame_mod.fused_field_planes(
            bg_l, depth_l, drops_l, tex, edges, keys_l, cfg,
            drop_offset=sp_idx * n_local, interpret=interpret)
        planes = jax.lax.psum(planes, "sp")
        overflow = jax.lax.psum(overflow, "sp")
        fmaps = frame_mod.crop_field_planes(planes, cfg)

        if env_save is None:
            return jax.vmap(
                lambda b, fg, fl, ov: frame_mod.finalize_frame(
                    b, fg, fl, None, ov, cfg))(
                bg_l, fogged, fmaps, overflow)
        return jax.vmap(lambda b, fg, fl, env, ov: frame_mod.finalize_frame(
            b, fg, fl, env, ov, cfg))(
            bg_l, fogged, fmaps, env_save, overflow)

    return jax.jit(_run)


def _out_treedef(cfg: PipelineConfig) -> FrameOutput:
    """Structure-only FrameOutput for out_specs tree mapping."""
    env = 0 if cfg.save_envmap else None
    sat = 0 if cfg.compute_saturation_mask else None
    return FrameOutput(rainy_image=0, rain_mask=0, envmap=env,
                       overflow=0, saturation_mask=sat)


def split_drops_for_sp(drops: DropBatch, sp: int) -> DropBatch:
    """Reshape a (B, N, ...) DropBatch so N shards evenly over sp.

    Pads N up to a multiple of sp (padded rows invalid)."""
    n = drops.ip1.shape[1]
    pad = (-n) % sp

    def padn(a):
        if pad == 0:
            return a
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a, widths)

    return jax.tree.map(padn, drops)
