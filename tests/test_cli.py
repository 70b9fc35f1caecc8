"""CLI resolution tests: check_args end-to-end on an on-disk dataset
(reference main.py:127-222 — streak-DB checks, plugin path resolution,
sequence validation, particle-file resolution)."""

import os

import numpy as np
import pytest
from PIL import Image

from raintpu import cli


def _make_dataset(root, seqs=("seqA", "seqB"), n_frames=2, broken=()):
    """customdb layout under root/data/source/customdb."""
    rng = np.random.RandomState(0)
    base = os.path.join(root, "data", "source", "customdb")
    for seq in seqs:
        os.makedirs(os.path.join(base, seq, "rgb"), exist_ok=True)
        if seq not in broken:
            os.makedirs(os.path.join(base, seq, "depth"), exist_ok=True)
        for i in range(n_frames):
            Image.fromarray((rng.rand(24, 48, 3) * 255).astype(
                np.uint8)).save(
                os.path.join(base, seq, "rgb", f"{i:06d}.png"))
            if seq not in broken:
                Image.fromarray((rng.rand(24, 48) * 5000).astype(
                    np.uint16)).save(
                    os.path.join(base, seq, "depth", f"{i:06d}.png"))
    return base


@pytest.fixture()
def ds(tmp_path, monkeypatch):
    root = str(tmp_path)
    _make_dataset(root)
    monkeypatch.chdir(root)
    return root


def test_check_args_resolves_sequences(ds):
    ns = cli.check_args(["--dataset", "customdb", "--intensity", "5,25",
                         "--online"])
    assert sorted(ns.sequences) == ["seqA", "seqB"]
    assert ns.weather == [{"weather": "rain", "fallrate": 5},
                          {"weather": "rain", "fallrate": 25}]
    # Online mode: no particle files, one None per weather.
    assert ns.particles["seqA"] == [None, None]
    a = ns.args
    assert a.verbose and a.frames is None
    # No rainstreakdb on disk -> procedural fallback selected.
    assert a.texture is None and a.norm_coeff is None
    for seq in ns.sequences:
        assert os.path.isdir(ns.images[seq])
        assert os.path.isdir(ns.depth[seq])
        assert ns.calib[seq] is None


def test_check_args_sequence_filter(ds):
    ns = cli.check_args(["--dataset", "customdb", "--sequences", "seqB",
                         "--online"])
    assert ns.sequences == ["seqB"]


def test_check_args_skips_invalid_sequences(ds):
    import shutil

    shutil.rmtree(os.path.join(ds, "data", "source", "customdb", "seqB",
                               "depth"))
    ns = cli.check_args(["--dataset", "customdb", "--online"])
    assert ns.sequences == ["seqA"]


def test_check_args_missing_dataset_root(ds):
    with pytest.raises(SystemExit, match="missing"):
        cli.check_args(["--dataset", "nosuchdb", "--online"])


def test_check_args_force_particles_conflicts_with_skip(ds):
    with pytest.raises(SystemExit, match="force_particles"):
        cli.check_args(["--dataset", "customdb", "--force_particles",
                        "--conflict_strategy", "skip"])


def test_check_args_runs_missing_simulations(ds):
    """Offline mode with no particle XML on disk auto-runs the
    on-device simulator (reference main.py:189-209)."""
    ns = cli.check_args(["--dataset", "customdb", "--sequences", "seqA",
                         "--intensity", "25"])
    assert ns.sequences == ["seqA"]
    (xml,) = ns.particles["seqA"]
    assert xml.endswith("_camera0.xml") and os.path.exists(xml)
    # Second resolution reuses the files instead of re-simulating.
    mtime = os.path.getmtime(xml)
    ns2 = cli.check_args(["--dataset", "customdb", "--sequences", "seqA",
                          "--intensity", "25"])
    assert ns2.particles["seqA"] == [xml]
    assert os.path.getmtime(xml) == mtime
