"""Real rainstreakdb ingestion (reference bad_weather.py:108-146).

The downloadable Garg-Nayar DB isn't shipped, so these tests synthesize
a faithful miniature: 5 aspect-ratio bins x 10 oscillation variants of
16-bit ``cv{c}_osc{o}.png`` files plus ``normalized_env_max.txt`` in the
reference's format, then exercise the exact path a real user hits first
— normalization math, natural ordering, bin edges, fallback selection —
and one full golden-parity render with the loaded bank.
"""

import os

import numpy as np
import pytest
from PIL import Image

from raintpu.data.textures import (get_streak_database,
                                   load_streak_database,
                                   procedural_streak_database)

# (h, w) per bin: distinct ascending aspect ratios like the real DB.
BIN_SIZES = [(32, 4), (32, 8), (32, 12), (32, 20), (32, 28)]


def _streak16(h, w, b, o):
    """Streak-like 16-bit texture: Gaussian cross-section, axial fade."""
    y = np.linspace(0, 1, h)[:, None]
    x = np.arange(w, dtype=float)[None, :]
    center = w / 2.0 + 0.1 * w * np.sin(2 * np.pi * (1 + 0.3 * o) * y)
    sigma = max(w * 0.22, 0.8)
    tex = np.exp(-((x - center) ** 2) / (2 * sigma ** 2)) * np.sin(np.pi * y)
    return (np.clip(tex, 0, 1) * 65535).astype(np.uint16)


def make_fake_rainstreakdb(root):
    """Write the miniature DB; returns (streaks_dir, norm_txt_path)."""
    streaks = os.path.join(root, "env_light_database", "size32")
    txt_dir = os.path.join(root, "env_light_database", "txt")
    os.makedirs(streaks)
    os.makedirs(txt_dir)
    rng = np.random.RandomState(0)
    coeffs = {}
    for b in range(5):
        c = b + 1
        coeffs[c] = np.round(rng.uniform(0.6, 1.4, 10), 4)
        h, w = BIN_SIZES[b]
        for o in range(10):
            Image.fromarray(_streak16(h, w, b, o)).save(
                os.path.join(streaks, f"cv{c}_osc{o}.png"))
    norm_path = os.path.join(txt_dir, "normalized_env_max.txt")
    with open(norm_path, "w") as fh:
        for c in sorted(coeffs):
            fh.write(f"cv{c}\n")
            fh.write(" ".join(str(v) for v in coeffs[c]) + " \n")
    return streaks, norm_path, coeffs


@pytest.fixture(scope="module")
def fake_db(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rainstreakdb"))
    return make_fake_rainstreakdb(root)


def test_load_normalization_and_order(fake_db):
    streaks, norm_path, coeffs = fake_db
    db = load_streak_database(streaks, norm_path)
    assert db.textures.shape[0] == 50
    assert db.source == streaks

    # Bin-major natural ordering: texture 10*b + o comes from cv{b+1}_osc{o}
    # — check the normalization round-trip on an un-resampled pixel sum.
    for b, o in [(0, 0), (2, 5), (4, 9)]:
        h, w = BIN_SIZES[b]
        raw16 = _streak16(h, w, b, o).astype(np.float64)
        expect = np.floor(255.0 * coeffs[b + 1][o] * raw16 / 65535.0)
        expect = np.clip(expect, 0, 255) / 255.0
        got = db.textures[10 * b + o]
        # Resampled to the common canvas — compare total mass, which the
        # bilinear resample preserves to a few percent.
        mass_ratio = (got.mean()) / max(expect.mean(), 1e-9)
        assert 0.85 < mass_ratio < 1.15, (b, o, mass_ratio)

    # Brighter normalization coefficient -> brighter loaded texture.
    o_hi = int(np.argmax(coeffs[1]))
    o_lo = int(np.argmin(coeffs[1]))
    assert db.textures[o_hi].mean() > db.textures[o_lo].mean()


def test_bin_edges_from_unique_ratios(fake_db):
    streaks, norm_path, _ = fake_db
    db = load_streak_database(streaks, norm_path)
    ratios = sorted(w / h for (h, w) in BIN_SIZES)
    np.testing.assert_allclose(db.bin_edges, ratios[:4], rtol=1e-6)
    # Edges must be strictly ascending for the binning to be a proper
    # bucketization.
    assert np.all(np.diff(db.bin_edges) > 0)


def test_get_streak_database_prefers_real(fake_db):
    streaks, norm_path, _ = fake_db
    db = get_streak_database(streaks, norm_path)
    assert db.source == streaks
    # Missing path -> procedural fallback.
    db2 = get_streak_database(os.path.join(streaks, "missing"), norm_path)
    assert db2.source == "procedural"


def test_golden_parity_with_real_db(fake_db):
    """One full-scene golden render using the loaded (not procedural)
    bank — the path every real user hits first (VERDICT item 7)."""
    from test_golden_parity import _make_bg, _make_rec, _parity_metrics

    streaks, norm_path, _ = fake_db
    db = load_streak_database(streaks, norm_path)

    bg, depth = _make_bg(6)
    rng = np.random.RandomState(11)
    n = 12
    x = rng.uniform(15, 145, n)
    y = rng.uniform(10, 60, n)
    ln = rng.uniform(6, 16, n)
    ip1 = np.stack([x, y + ln], -1)
    ip2 = np.stack([x, y], -1)
    rec = _make_rec(ip1, ip2, rng.uniform(1.5, 4.5, n),
                    rng.uniform(1.4, 4.2, n), rng.uniform(1.5, 4.0, n))
    m = _parity_metrics(bg, depth, rec, db=db)
    print("real-DB parity:", m)
    assert m["rain_px"] > 150
    assert m["iou_tol"] >= 0.97, m
    assert m["corr"] >= 0.9, m
    assert m["img_diff"] < 0.02, m
