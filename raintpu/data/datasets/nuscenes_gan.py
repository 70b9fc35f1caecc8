"""nuScenes-GAN dataset plugin: renders rain onto GAN-translated frames.

Same scene structure as :mod:`raintpu.data.datasets.nuscenes`, but
image paths are redirected into the GAN output tree with a filename
postfix (e.g. ``_fake_B``); the particle simulation stays at the
original 1600x900 resolution while rendering happens at the GAN output
resolution (the ``nuscenes_gan`` rescale path of the XML loader,
reference ``bad_weather.py:213-219``).
"""

from __future__ import annotations

import json
import os

from raintpu.data.nuscenes_data import NuScenesGANCameraData
from raintpu.data.datasets import nuscenes as _nusc

_dataset = None


def _get_dataset(params) -> NuScenesGANCameraData:
    global _dataset
    if _dataset is None:
        tokens = None
        json_file = getattr(params, "json_file", None)
        if json_file:
            with open(json_file) as fh:
                tokens = json.load(fh)["sample_data_tokens"]
        _dataset = NuScenesGANCameraData(
            dataroot=params.dataset_root,
            gan_root=getattr(params, "gan_root", params.dataset_root),
            post_fix=getattr(params, "post_fix", ""),
            specific_tokens=tokens)
    return _dataset


def resolve_paths(params):
    ds = _get_dataset(params)
    scenes = _nusc._select_sequences(params, ds.scene_tokens)
    if not scenes:
        raise FileNotFoundError("No nuScenes scenes matched the filter.")
    params.sequences = scenes
    root = ds.gan_root
    params.images = {
        s: [os.path.join(root, rel) for rel in ds.get_filepaths(s)]
        for s in scenes}
    params.depth = {
        s: [os.path.join(params.depth_root,
                         os.path.splitext(os.path.basename(rel))[0].replace(
                             ("_" + ds.post_fix) if ds.post_fix else "", "")
                         + ".npy")
            for rel in ds.get_filepaths(s)]
        for s in scenes}
    params.calib = {s: None for s in scenes}
    return params


def settings():
    return _nusc.settings()
