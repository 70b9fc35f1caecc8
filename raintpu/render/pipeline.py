"""Sequence/weather/frame orchestration — the host-side render driver.

Replaces the reference ``Generator`` loop nest (``common/generator.py``)
and the ``main_threaded.py`` process farm: frames are batched, I/O is
prefetched on threads, and the whole batch renders in one device step
(optionally sharded over a mesh — :mod:`raintpu.parallel`).

Load-bearing behaviors kept from the reference:
- conflict strategies ``overwrite|skip|rename_folder`` at folder and
  frame granularity (``generator.py:85-104,213-226,328-336``) — the
  file-keyed idempotency that doubles as crash-resume;
- per-frame determinism: RNG keyed by frame index, independent of
  ``--frame_start`` (``generator.py:303,317-318``);
- output layout ``OUT/DATASET[_strategy]/SEQ/rain/{N}mm/{rainy_image,
  rain_mask}/NAME.png`` + sequence-level ``envmap/``;
- ``rain_mask`` saved like ``plt.imsave`` (normalized colormap PNG,
  ``generator.py:467``) plus a lossless 16-bit grayscale companion.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from raintpu.data import io as data_io
from raintpu.data.textures import (StreakDatabase, get_streak_database,
                                   texture_bank)
from raintpu.particles import xml_io
from raintpu.particles.schema import pack_drop_batch
from raintpu.render.camera import RenderSettings, settings_from_dict
from raintpu.render.frame import PipelineConfig, render_frames
from raintpu.utils.logging import (ProgressScope, natural_listdir,
                                   print_warning)


@dataclasses.dataclass
class JobSpec:
    """One rendering job (the reference's parsed-args surface)."""

    dataset: str
    sequences: Sequence[str]
    images: Dict[str, object]       # seq -> dir or file list
    depth: Dict[str, object]
    calib: Dict[str, object]
    particles: Dict[str, List[str]]  # seq -> XML path per weather
    weather: List[dict]              # [{"weather": "rain", "fallrate": i}]
    settings: dict                   # reference-style settings dict
    output_root: str
    streaks_db: Optional[str] = None
    norm_coeff: Optional[str] = None
    conflict_strategy: Optional[str] = None
    rendering_strategy: Optional[str] = None
    save_envmap: bool = False
    # Compute + save the reference's rainy_saturation_mask
    # (bad_weather.py:450-460; it accumulates one per frame).
    save_saturation: bool = False
    # Environment-map source: 'ours' extrapolates from the frame
    # (generator.py:400); 'pano' loads a captured panorama per frame
    # from panos_dir/<frame-file-name> (generator.py:401-403, which
    # reads data/panos/<file_name>).
    env_type: str = "ours"
    panos_dir: Optional[str] = None
    frame_start: int = 0
    frame_end: Optional[int] = None
    frame_step: int = 1
    frames: Optional[List[int]] = None
    noise_scale: float = 0.0
    noise_std: float = 0.0
    opacity_attenuation: float = 1.0
    verbose: bool = True
    batch_size: int = 4
    drop_capacity: int = 2048
    seed: int = 0
    # default: the fixed 4-rung RasterConfig.default ladder;
    # fitted: measure this weather's drop population and fit the
    #   bucket ladder to it (ops.rasterize.fit_raster_config — the
    #   round-3 headline win, ~1.5x over the hand ladder);
    # tiny: minimal buckets for tests/smoke runs.
    raster_profile: str = "default"   # default | fitted | tiny
    # Block-reduction of the cone-photometry envmap features
    # (PipelineConfig.cone_downsample). 4 is the production default:
    # measured +21% fresh-frame throughput on v5e (BENCH A/B, round 4)
    # with max rain-pixel image effect 1.6e-3 — 19x under the 0.03
    # parity interior bar. 1 = exact (the A/B/debug setting).
    cone_downsample: int = 4
    # Output encoding: 'png' matches the reference's output contract
    # (generator.py:466-469). 'npy' dumps raw arrays (rainy uint8,
    # mask float32) — PNG encode is zlib-bound on the host (~5-10 ms/
    # frame/core) and caps disk-to-disk throughput far below the device
    # rate on small hosts; npy is a memcpy to the page cache.
    save_format: str = "png"


class RenderJob:
    def __init__(self, spec: JobSpec):
        self.spec = spec
        self.db: Optional[StreakDatabase] = None
        self._resolve_conflict_strategy()
        # Saves run on a thread pool: PNG encode costs ~5-10 ms/frame on
        # host, which would throttle the device at production rates.
        import concurrent.futures as cf
        self._save_pool = cf.ThreadPoolExecutor(max_workers=8)
        self._save_futures = []
        self._overflow_total = 0
        self._truncated_total = 0

    # -- conflict handling ------------------------------------------------
    def _existing_output_dirs(self) -> List[str]:
        s = self.spec
        out = []
        for seq in s.sequences:
            for w in s.weather:
                d = os.path.join(self._output_root(), seq, w["weather"],
                                 f'{w["fallrate"]}mm')
                if os.path.exists(d):
                    out.append(d)
        return out

    def _resolve_conflict_strategy(self) -> None:
        s = self.spec
        existing = self._existing_output_dirs()
        if existing and s.conflict_strategy is None:
            print("\nOutput folders already exist:\n  " +
                  "\n  ".join(existing))
            if sys.stdin.isatty():
                while s.conflict_strategy not in ("overwrite", "skip",
                                                  "rename_folder"):
                    s.conflict_strategy = input(
                        "Strategy (overwrite|skip|rename_folder): ").strip()
            else:
                print_warning("Non-interactive session: using 'skip'.")
                s.conflict_strategy = "skip"
        if s.conflict_strategy not in (None, "overwrite", "skip",
                                       "rename_folder"):
            raise ValueError(
                f"Unknown conflict strategy {s.conflict_strategy!r}")

    def _output_root(self) -> str:
        s = self.spec
        name = s.dataset if s.rendering_strategy is None else \
            f"{s.dataset}_{s.rendering_strategy}"
        return os.path.join(s.output_root, name)

    # -- inputs -----------------------------------------------------------
    def _frame_files(self, seq: str):
        s = self.spec
        images = s.images[seq]
        if isinstance(images, (list, tuple, np.ndarray)):
            files = list(images)
        else:
            files = [os.path.join(images, f)
                     for f in natural_listdir(images)]
        depths = s.depth[seq]
        if isinstance(depths, (list, tuple, np.ndarray)):
            dfiles = list(depths)
        else:
            dfiles = [os.path.join(depths, f)
                      for f in natural_listdir(depths)]
        return files, dfiles

    def _frame_indices(self, n_files: int) -> List[int]:
        s = self.spec
        f_end = n_files if s.frame_end is None else min(s.frame_end, n_files)
        if s.frames:
            return np.unique(np.clip(s.frames, 0, f_end - 1)).tolist()
        return list(range(s.frame_start, f_end, s.frame_step))

    def _render_settings(self, fallrate) -> RenderSettings:
        s = self.spec
        rs = settings_from_dict(s.settings)
        return dataclasses.replace(
            rs, noise_scale=s.noise_scale, noise_std=s.noise_std,
            opacity_attenuation=s.opacity_attenuation,
            rendering_strategy=s.rendering_strategy,
            env_type=s.env_type)

    def _load_pano(self, image_file: str):
        """Captured panorama for a frame (env_type='pano'): the file of
        the same name under panos_dir (reference generator.py:401-403)."""
        s = self.spec
        if s.env_type != "pano":
            return None
        if not s.panos_dir:
            raise ValueError("env_type='pano' requires panos_dir")
        path = os.path.join(s.panos_dir, os.path.basename(image_file))
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.float32) / 255.0

    # -- output -----------------------------------------------------------
    @staticmethod
    def _save_rainy(path: str, rainy: np.ndarray) -> None:
        arr = (np.clip(rainy, 0, 1) * 255).round().astype(np.uint8)
        if path.endswith(".npy"):
            np.save(path, arr)
            return
        from PIL import Image

        Image.fromarray(arr).save(path)

    @staticmethod
    def _save_mask_npy(path: str, mask: np.ndarray) -> None:
        np.save(path, np.asarray(mask, np.float32))

    @staticmethod
    def _save_mask(path: str, mask: np.ndarray) -> None:
        # Colormapped normalized PNG, like plt.imsave of a 2-D array
        # (generator.py:467) ...
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, mask)
        # ... plus a lossless 16-bit grayscale companion for metrics.
        from PIL import Image

        raw = np.clip(mask / max(float(mask.max()), 1e-9), 0, 1)
        Image.fromarray((raw * 65535).astype(np.uint16)).save(
            path.replace(".png", "_raw.png"))

    # -- main loop --------------------------------------------------------
    def run(self) -> dict:
        import jax
        import jax.numpy as jnp

        s = self.spec
        t_start = time.perf_counter()
        stats = {"rendered": 0, "skipped": 0, "failed": 0}
        self.db = get_streak_database(s.streaks_db, s.norm_coeff,
                                      seed=s.seed)
        textures = texture_bank(self.db)
        edges = jnp.asarray(self.db.bin_edges)

        prog = ProgressScope(["sequence", "weather", "frame"])
        prog.start("sequence", len(s.sequences))

        for seq_i, seq in enumerate(s.sequences):
            prog.update("sequence", seq_i)
            prog.start("weather", len(s.weather))
            files, dfiles = self._frame_files(seq)

            for w_i, weather in enumerate(s.weather):
                prog.update("weather", w_i)
                fallrate = weather["fallrate"]
                out_seq = os.path.join(self._output_root(), seq)
                out_dir = os.path.join(out_seq, weather["weather"],
                                       f"{fallrate}mm")
                if os.path.exists(out_dir) and \
                        s.conflict_strategy == "rename_folder":
                    i = 0
                    while os.path.exists(out_dir + "_copy%05d" % i):
                        i += 1
                    out_dir = out_dir + "_copy%05d" % i
                os.makedirs(out_dir, exist_ok=True)

                first = data_io.load_frame(
                    files[0], dfiles[0],
                    int(s.settings["render_scale"]),
                    int(s.settings["depth_scale"]))
                if first is None:
                    print_warning(f"Sequence {seq}: first depth missing")
                    continue
                hw = first[0].shape[:2]
                # Prepare this weather's drop source (XML by default;
                # overridden by the online simulator job).
                self._setup_drop_source(seq, w_i, weather, hw)

                rsettings = self._render_settings(fallrate)
                if s.raster_profile == "tiny":
                    from raintpu.ops.rasterize import (BucketSpec,
                                                      RasterConfig)
                    raster = RasterConfig(
                        buckets=(BucketSpec(32, 24, 4, s.drop_capacity),
                                 BucketSpec(64, 48, 8, 16)),
                        supersample=1)
                    cfg = PipelineConfig(
                        settings=rsettings, image_hw=tuple(hw),
                        fallrate=float(fallrate), raster=raster,
                        env_downsample=8, save_envmap=s.save_envmap,
                        compute_saturation_mask=s.save_saturation,
                        cone_downsample=s.cone_downsample)
                elif s.raster_profile == "fitted":
                    # Fit the bucket ladder to this weather's measured
                    # drop population (sampled from the drop source
                    # just set up above). Bucket-overflow counters
                    # still warn if later frames outgrow the fit.
                    from raintpu.ops.rasterize import fit_raster_config
                    sample = self._drops_for_frames(
                        list(range(min(8, max(1, len(files))))))
                    raster = fit_raster_config(
                        sample, textures.raw.shape[1:],
                        (hw[1], hw[0]), rsettings)
                    cfg = PipelineConfig(
                        settings=rsettings, image_hw=tuple(hw),
                        fallrate=float(fallrate), raster=raster,
                        save_envmap=s.save_envmap,
                        compute_saturation_mask=s.save_saturation,
                        cone_downsample=s.cone_downsample)
                else:
                    cfg = PipelineConfig.build(
                        rsettings, hw, fallrate,
                        drop_capacity=s.drop_capacity,
                        save_envmap=s.save_envmap,
                        compute_saturation_mask=s.save_saturation,
                        cone_downsample=s.cone_downsample)
                # Value-gate the pair/row-strip kernel modes on real
                # hardware (once per process) so a Mosaic divergence
                # falls back to the proven kernel instead of silently
                # mis-rendering production output.
                from raintpu.render.frame import resolve_kernel_modes
                cfg = resolve_kernel_modes(cfg)

                idx = self._frame_indices(len(files))
                prog.start("frame", len(idx))

                if s.save_format not in ("png", "npy"):
                    raise ValueError(
                        f"save_format={s.save_format!r}: expected "
                        "'png' or 'npy'")
                ext = "." + s.save_format
                # Pending (frame index, name) after existence filtering.
                work = []
                for i in idx:
                    name = os.path.splitext(
                        os.path.basename(files[i]))[0]
                    out_img = os.path.join(out_dir, "rainy_image",
                                           name + ext)
                    out_mask = os.path.join(out_dir, "rain_mask",
                                            name + ext)
                    if (os.path.exists(out_img)
                            or os.path.exists(out_mask)):
                        if s.conflict_strategy == "skip":
                            stats["skipped"] += 1
                            continue
                        if s.conflict_strategy != "overwrite":
                            raise FileExistsError(out_img)
                    work.append((i, name, out_img, out_mask))

                os.makedirs(os.path.join(out_dir, "rainy_image"),
                            exist_ok=True)
                os.makedirs(os.path.join(out_dir, "rain_mask"),
                            exist_ok=True)
                if s.save_saturation:
                    os.makedirs(os.path.join(out_dir, "saturation_mask"),
                                exist_ok=True)
                if s.save_envmap:
                    os.makedirs(os.path.join(out_seq, "envmap"),
                                exist_ok=True)

                def load_one(item):
                    i, name, oi, om = item
                    pair = data_io.load_frame(
                        files[i], dfiles[i],
                        int(s.settings["render_scale"]),
                        int(s.settings["depth_scale"]))
                    if pair is not None and s.env_type == "pano":
                        pair = pair + (self._load_pano(files[i]),)
                    return (i, name, oi, om, pair)

                B = s.batch_size
                batch: List = []
                done = 0
                for item in data_io.prefetch_map(load_one, work):
                    if item[4] is None:
                        stats["failed"] += 1
                        continue
                    batch.append(item)
                    if len(batch) == B:
                        self._render_batch(batch, textures, edges, cfg,
                                           out_seq, stats)
                        done += len(batch)
                        prog.update("frame", max(done - 1, 0))
                        if s.verbose:
                            sys.stdout.write("\r" + prog.line() + "   ")
                        batch = []
                if batch:
                    self._render_batch(batch, textures, edges, cfg,
                                       out_seq, stats)
                if s.verbose:
                    sys.stdout.write("\r" + prog.line() + "\n")

        # Drain pending saves; surface any I/O error.
        for fut in self._save_futures:
            fut.result()
        self._save_futures.clear()
        stats["overflowed_drops"] = self._overflow_total
        stats["truncated_drops"] = self._truncated_total
        # Disk-to-disk throughput: wall time of the whole run()
        # (image/depth reads, device render incl. first compiles,
        # encode + writes) over frames actually rendered.
        elapsed = time.perf_counter() - t_start
        stats["elapsed_s"] = round(elapsed, 2)
        if stats["rendered"] and elapsed > 0:
            stats["img_per_s"] = round(stats["rendered"] / elapsed, 2)
        if self._truncated_total:
            print_warning(
                f"{self._truncated_total} drop(s) were truncated at pack "
                "time (population larger than --drop_capacity).")
        return stats

    # -- drop sources -----------------------------------------------------
    def _setup_drop_source(self, seq, w_i, weather, hw) -> None:
        """Default: load the weather's particle XML (precomputed mode)."""
        s = self.spec
        self._streaks = xml_io.load_streaks(
            s.particles[seq][w_i], image_wh=(hw[1], hw[0]),
            render_scale=s.settings["render_scale"], dataset=s.dataset)
        self._frame_ids = sorted(self._streaks)
        self._trunc_seen = set()

    def _drops_for_frame(self, frame_idx: int):
        """DropBatch for one frame index (reference generator.py:321:
        frame index modulo the number of simulated frames)."""
        s = self.spec
        fid = self._frame_ids[frame_idx % len(self._frame_ids)] \
            if self._frame_ids else None
        rec = self._streaks.get(fid) if fid is not None else None
        if rec is None:
            from raintpu.particles.schema import empty_drop_batch
            return empty_drop_batch(s.drop_capacity)
        if frame_idx not in self._trunc_seen:  # batch padding repeats
            self._trunc_seen.add(frame_idx)
            self._truncated_total += max(
                0, len(rec["ip1"]) - s.drop_capacity)
        return pack_drop_batch(rec, s.drop_capacity)

    def _drops_for_frames(self, frame_indices):
        """Batched drop source: stacked DropBatch with leading dim
        len(frame_indices). Overridden by the online job with one jitted
        vmapped simulation call."""
        import jax
        import jax.numpy as jnp

        return jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[self._drops_for_frame(i) for i in frame_indices])

    def _render_batch(self, batch, textures, edges, cfg, out_seq,
                      stats) -> None:
        import jax
        import jax.numpy as jnp

        s = self.spec
        n_real = len(batch)
        bgs, depths, keys, fidx, panos = [], [], [], [], []
        for (i, name, oi, om, pair) in batch:
            bg, depth = pair[0], pair[1]
            fidx.append(i)
            bgs.append(bg)
            depths.append(depth)
            panos.append(pair[2] if len(pair) > 2 else None)
            keys.append(jax.random.PRNGKey(s.seed * 100003 + i))
        # Pad a short final batch to the compiled batch size.
        while len(bgs) < s.batch_size:
            bgs.append(bgs[-1])
            depths.append(depths[-1])
            fidx.append(fidx[-1])
            panos.append(panos[-1])
            keys.append(keys[-1])

        drops = self._drops_for_frames(fidx)
        pano_arr = jnp.asarray(np.stack(panos)) \
            if panos[0] is not None else None
        out = render_frames(jnp.asarray(np.stack(bgs)),
                            jnp.asarray(np.stack(depths)),
                            drops, textures, edges,
                            jnp.stack(keys), cfg, pano=pano_arr)
        rainy = np.asarray(out.rainy_image)
        masks = np.asarray(out.rain_mask)
        envs = np.asarray(out.envmap) if cfg.save_envmap else None
        sats = np.asarray(out.saturation_mask) \
            if cfg.compute_saturation_mask else None

        # Padded duplicate frames must not count toward overflow: slice
        # to the real batch before summing (truncation has the
        # _trunc_seen guard; this is the overflow-side equivalent).
        overflow = int(np.asarray(out.overflow)[:n_real].sum())
        if overflow > 0:
            self._overflow_total += overflow
            print_warning(
                f"{overflow} drop(s) exceeded bucket capacity and were "
                "dropped — raise --drop_capacity.")

        for bi, (i, name, oi, om, _pair) in enumerate(batch[:n_real]):
            ext = os.path.splitext(oi)[1]
            save_mask = (self._save_mask_npy if ext == ".npy"
                         else self._save_mask)
            self._save_futures.append(self._save_pool.submit(
                self._save_rainy, oi, rainy[bi]))
            self._save_futures.append(self._save_pool.submit(
                save_mask, om, masks[bi]))
            if envs is not None:
                self._save_futures.append(self._save_pool.submit(
                    self._save_rainy,
                    os.path.join(out_seq, "envmap", name + ext),
                    envs[bi]))
            if sats is not None:
                self._save_futures.append(self._save_pool.submit(
                    self._save_rainy,
                    os.path.join(os.path.dirname(os.path.dirname(om)),
                                 "saturation_mask", name + ext),
                    np.clip(sats[bi], 0, 1)))
            stats["rendered"] += 1
