import numpy as np
import jax.numpy as jnp

from raintpu.ops.envmap import envmap_geometry, generate_envmap


def test_geometry_kitti_numbers():
    # KITTI: W=1242, H=375, focal 6mm.
    g = envmap_geometry(375, 1242, 6.0)
    assert g.focal_env == int((6.0 / 12.7) * 1242) == 586
    cx = 621
    assert g.min_x == round(586 * np.arctan(-cx / 586) + cx)
    assert g.cyl_width == round(586 * np.arctan(cx / 586) + cx) - g.min_x + 1
    assert g.env_width == g.cyl_width + 2 * (g.cyl_width // 2)


def np_forward_envmap(background, geom):
    """Independent numpy transcription of the reference's *forward*
    scatter pipeline (bad_weather.py:742-819): cylinder scatter with
    first-occurrence dedup, per-column top/bottom fill, mirror extension.
    (Feather blur omitted; compared only on covered pixels.)"""
    h, w, _ = background.shape
    cx, cy = w // 2, h // 2
    f = geom.focal_env

    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dr = yy - cy
    dc = xx - cx
    out_r = np.round(f * (dr / np.sqrt(dc ** 2 + f ** 2)) + cy)
    out_c = np.round(f * np.arctan(dc / f) + cx) - geom.min_x

    cyl = np.zeros((h, geom.cyl_width, 3))
    mask = np.zeros((h, geom.cyl_width), bool)
    coords = np.stack([out_r.ravel(), out_c.ravel()], -1).astype(np.int64)
    vals, idx = np.unique(coords, axis=0, return_index=True)
    flat = background.reshape(-1, 3)
    ok = (vals[:, 0] >= 0) & (vals[:, 0] < h) & \
         (vals[:, 1] >= 0) & (vals[:, 1] < geom.cyl_width)
    cyl[vals[ok, 0], vals[ok, 1]] = flat[idx[ok]]
    mask[vals[ok, 0], vals[ok, 1]] = True

    # Top fill: first covered row per column; bottom: last covered row.
    for c in range(geom.cyl_width):
        rows = np.where(mask[:, c])[0]
        if len(rows) == 0:
            continue
        top = mask[: h // 2, c]
        cyl[: h // 2, c][~top] = cyl[rows[0], c]
        bot = mask[h // 2:, c]
        cyl[h // 2:, c][~bot] = cyl[rows[-1], c]

    b = geom.border
    left = cyl[:, :b][:, ::-1]
    right = cyl[:, b if geom.cyl_width % 2 else b:][:, ::-1]
    right = cyl[:, geom.cyl_width // 2:][:, ::-1]
    out = np.concatenate([left, cyl, np.zeros_like(left)], axis=1)
    out[:, out.shape[1] - right.shape[1]:] = right

    mleft = mask[:, :b][:, ::-1]
    mright = mask[:, geom.cyl_width // 2:][:, ::-1]
    mout = np.concatenate([mleft, mask, np.zeros_like(mleft)], axis=1)
    mout[:, mout.shape[1] - mright.shape[1]:] = mright
    return out, mout


def test_envmap_matches_forward_scatter(rng):
    # A smooth image: gather vs scatter should agree closely wherever the
    # scatter actually covered pixels.
    h, w = 48, 96
    yy, xx = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")
    img = np.stack([0.3 + 0.5 * xx, 0.2 + 0.6 * yy,
                    0.5 + 0.3 * np.sin(6 * xx)], -1).astype(np.float32)

    geom = envmap_geometry(h, w, 6.0)
    got = np.asarray(generate_envmap(jnp.asarray(img), geom))
    want, mask = np_forward_envmap(img.astype(np.float64), geom)

    assert got.shape == (h, geom.env_width, 3)
    diff = np.abs(got - want)[mask]
    assert diff.mean() < 0.02, diff.mean()
    assert np.quantile(diff, 0.95) < 0.05


def test_envmap_covered_region_preserves_center_pixel():
    h, w = 40, 80
    img = np.full((h, w, 3), 0.25, np.float32)
    img[h // 2, w // 2] = (1.0, 0.0, 0.0)
    geom = envmap_geometry(h, w, 6.0)
    env = np.asarray(generate_envmap(jnp.asarray(img), geom))
    # The image center maps to the cylinder center (border + cyl/2).
    c = geom.border + geom.cyl_width // 2
    assert env[h // 2, c, 0] > 0.9


def test_chunked_matmul_matches_gather_exactly():
    """The large-map path (chunked central matmul + mirror flanks,
    round 3) must reproduce the index-map gather BIT-exactly — each
    one-hot row has a single nonzero, so the matmul sum has exactly
    one term."""
    from raintpu.ops.envmap import (_generate_matmul_chunked,
                                    _source_indices)

    rng2 = np.random.RandomState(7)
    for (h, w) in ((96, 256), (64, 130)):   # even and odd cyl widths
        geom = envmap_geometry(h, w, 6.0)
        bg = jnp.asarray(rng2.rand(h, w, 3).astype(np.float32))
        src_r, src_c, cov = _source_indices(geom, jnp.float32)
        ref = np.asarray(bg)[np.asarray(src_r), np.asarray(src_c)]
        env, covered = _generate_matmul_chunked(bg, geom)
        assert np.array_equal(np.asarray(env), ref)
        assert np.array_equal(np.asarray(covered), np.asarray(cov))
