"""Reference-faithful NumPy/cv2 rain renderer for golden comparisons.

An independent reimplementation of the reference's per-drop algorithm
(Garg-Nayar photometric blending, 20-gon FOV polygon, cv2 warps,
scipy defocus, sequential in-place blending) used as the golden oracle
in tests: the real reference cannot run here (pyclipper/imutils are not
installed), so this follows its published math step by step — including
its approximations (20-ray polygon instead of the exact cone) — while
raintpu's production path uses the analytic TPU formulation. Agreement
between the two validates the analytic redesign end to end.

Not production code; clarity over speed.
"""

from __future__ import annotations

import numpy as np


def rgb_to_xyY(arr):
    mat = np.array([[0.49, 0.31, 0.20],
                    [0.17697, 0.81240, 0.01063],
                    [0.0, 0.01, 0.99]])
    xyz = arr @ mat / 0.17697
    s = xyz.sum(-1)
    with np.errstate(invalid="ignore", divide="ignore"):
        x = xyz[..., 0] / s
        y = xyz[..., 1] / s
    out = np.stack([x, y, xyz[..., 1]], -1)
    out[np.isnan(out)] = 0
    return out


def xyY_to_rgb(xyY):
    x, y, Y = xyY[..., 0], xyY[..., 1], xyY[..., 2]
    with np.errstate(invalid="ignore", divide="ignore"):
        X = Y * x / y
        Z = Y * (1 - x - y) / y
    mat = np.array([[0.41847, -0.15866, -0.082835],
                    [-0.091169, 0.25243, 0.015708],
                    [0.0009209, -0.0025498, 0.1786]])
    out = np.stack([X, Y, Z], -1) @ mat
    out[~np.isfinite(out)] = 0
    return out


def solid_angles(h, w):
    """L'Huillier per-pixel solid angles of an (h, w) lat-long map."""
    cols = np.linspace(0, 1, w + 1)
    rows = np.linspace(0, 1, h + 1)
    u, v = np.meshgrid(cols, rows)
    theta = np.pi * (2 * u - 1)
    phi = np.pi * v
    d = np.stack([np.sin(phi) * np.sin(theta), np.cos(phi),
                  -np.sin(phi) * np.cos(theta)], -1)

    def tetra(a, b, c):
        ta = np.arccos(np.clip((b * c).sum(-1), -1, 1))
        tb = np.arccos(np.clip((a * c).sum(-1), -1, 1))
        tc = np.arccos(np.clip((a * b).sum(-1), -1, 1))
        ts = (ta + tb + tc) / 2
        p = (np.tan(ts / 2) * np.tan((ts - ta) / 2)
             * np.tan((ts - tb) / 2) * np.tan((ts - tc) / 2))
        return 4 * np.arctan(np.sqrt(np.maximum(p, 0)))

    a, b = d[:-1, :-1], d[:-1, 1:]
    c, e = d[1:, :-1], d[1:, 1:]
    return tetra(a, b, c) + tetra(b, c, e)


def rotation_matrix(axis, theta):
    axis = np.asarray(axis, float)
    c, s = np.cos(theta), np.sin(theta)
    skv = np.roll(np.roll(np.diag(axis), 1, 1), -1, 0)
    return (c * np.eye(3) + s * (skv - skv.T)
            + (1 - c) * np.outer(axis, axis))


def fov_polygon(drop_pos_parsed, env_shape, radius=10.0, fov_deg=165.0,
                n_rays=20):
    """20-gon FOV polygon on the lat-long map — the reference's cone
    discretization (bad_weather.py:596-704), with its axis swap, sphere
    intersection, cart2sph image mapping, and polar-wrap handling."""
    p = np.array([drop_pos_parsed[0], drop_pos_parsed[2],
                  drop_pos_parsed[1]], float)
    n = p / np.linalg.norm(p)
    theta = np.deg2rad(fov_deg / 2)

    a, b, c = n
    d = float(p @ n)
    if b == 0:
        b = 0.001
    px_ = p[1]
    pz = 0.0
    py = (-a * px_ + d - c * pz) / b
    u = p - np.array([px_, py, pz])
    u = u / np.linalg.norm(u)

    rot_vec = np.cross(u, n)
    v = n @ rotation_matrix(rot_vec, -theta)

    rows, cols = env_shape[:2]
    pts_img = []
    azs = []
    for ang in np.arange(0, 2 * np.pi, 2 * np.pi / n_rays):
        dirv = v @ rotation_matrix(n, ang)
        # line-sphere intersection from p along dirv, radius about origin
        aa = dirv @ dirv
        bb = 2 * dirv @ p
        cc = p @ p - radius ** 2
        t1 = (-bb + np.sqrt(bb * bb - 4 * aa * cc)) / (2 * aa)
        q = p + t1 * dirv
        az = np.arctan2(q[1], q[0])
        if az < 0:
            az += 2 * np.pi
        el = np.arctan2(q[2], np.hypot(q[0], q[1]))
        if el < 0:
            el += 2 * np.pi
        azimuth = ((2 * np.pi - az) - np.pi / 2) % (2 * np.pi)
        uu = azimuth / (2 * np.pi)
        elevation = (el + np.pi / 2) % (2 * np.pi)
        vv = 1.0 - elevation / np.pi
        azs.append(azimuth)
        pts_img.append([uu * cols, vv * rows])
    pts_img = np.asarray(pts_img)
    azs = np.asarray(azs + [azs[0]])

    cond = np.isclose(np.diff(azs), 0) | (np.diff(azs) < 0)
    n_true, n_false = cond.sum(), (~cond).sum()
    if n_true == 1:  # wraps over the top pole
        i = np.where(cond)[0][0]
        final = np.vstack([pts_img[:i + 1],
                           [cols, pts_img[i][1]], [cols, 0], [0, 0],
                           [0, pts_img[(i + 1) % n_rays][1]],
                           pts_img[i + 1:]])
    elif n_false == 1:  # wraps under the bottom pole
        i = np.where(~cond)[0][0]
        final = np.vstack([pts_img[:i + 1],
                           [0, pts_img[i][1]], [0, rows], [cols, rows],
                           [cols, pts_img[(i + 1) % n_rays][1]],
                           pts_img[i + 1:]])
    else:
        final = pts_img
    return final


def render_reference(bg, fogged, drops, textures, tex_choice,
                     *, exposure_s, focal_m, f_number=6.0,
                     focus_plane=6.0, opacity_attenuation=1.0,
                     coc_pixsize=4.65e-6, rendering_strategy=None):
    """Sequential per-drop render following the reference algorithm.

    rendering_strategy: None (physics) | 'white' | 'naive_db'
    (bad_weather.py:349-360). In the strategy modes the reference skips
    the envmap recolor AND the defocus blur (both live in the physics
    else-branch), keeps the gray texture as the drop color, and uses
    lo=1 ('white') or the length-opacity without attenuation
    ('naive_db' as intended — the reference's own branch crashes on a
    misspelled attribute).

    bg/fogged: (H, W, 3) RGB float; drops: host dict record (ip1 rounded
    etc.); textures (K, TH, TW); tex_choice (N,) texture index per drop.
    Returns (rainy, mask, sat_mask) — sat_mask is the reference's
    rainy_saturation_mask: per-drop sum of clip(drop_rgb, 0, 1)
    (bad_weather.py:452-453,459-460).
    """
    import cv2
    from scipy.ndimage import gaussian_filter

    h, w = bg.shape[:2]
    rainy = fogged.astype(np.float64).copy()
    mask = np.zeros((h, w))
    sat_mask = np.zeros((h, w, 3))

    # Envmap: use raintpu's gather version (validated separately against
    # the forward scatter in test_envmap) to isolate drop-path diffs.
    from raintpu.ops.envmap import envmap_geometry, generate_envmap
    import jax.numpy as jnp

    geom = envmap_geometry(h, w, focal_m * 1000)
    env = np.asarray(generate_envmap(jnp.asarray(fogged, jnp.float32),
                                     geom)).astype(np.float64)
    env_xyY = rgb_to_xyY(env)
    sa = solid_angles(*env.shape[:2])
    total_sa = sa.sum()
    ambient = (env_xyY[..., 2] * sa).sum() / total_sa

    tau_zero = np.sqrt(1.16e-3) / 50

    n = len(drops["ip1"])
    for i in range(n):
        tex = textures[tex_choice[i]].astype(np.float64)
        th, tw = tex.shape
        ip1 = drops["ip1"][i].astype(float)
        ip2 = drops["ip2"][i].astype(float)
        iw1, iw2 = float(drops["iw1"][i]), float(drops["iw2"][i])
        big = drops["drop_type"][i] == 0

        if big:
            x0, y0 = round(ip1[0]), round(ip1[1])
            x1, y1 = round(ip2[0]), round(ip2[1])
            d0, d1 = np.floor(iw1), np.floor(iw2)
            minx = max(min(x0, x1), 0)
            miny = max(min(y0, y1), 0)
            maxx = min(max(x0 + d0, x1 + d1), w)
            maxy = min(max(y0, y1), h)
            p1 = np.float32([[0, 0], [tw, 0], [tw, th], [0, th]])
            p2 = np.float32([
                [x0 - minx, y0 - miny], [x0 - minx + d0, y0 - miny],
                [x1 - minx + d1 + 1e-3, y1 - miny],
                [x1 - minx + 1e-3, y1 - miny]])
            m = cv2.getPerspectiveTransform(p1, p2)
            size = (max(int(maxx - minx), 1), max(int(maxy - miny), 1))
            patch = cv2.warpPerspective(tex, m, size, flags=cv2.INTER_CUBIC)
            patch = np.clip(patch, 0, 1)
            min_c = np.array([minx, miny], int)
        else:
            d = ip1 - ip2
            theta = np.degrees(np.arccos(np.clip(
                -d[1] / np.linalg.norm(d), -1, 1)))
            # rotate_bound (expand canvas, rotate clockwise by theta)
            cx, cy = tw // 2, th // 2
            m = cv2.getRotationMatrix2D((cx, cy), -theta, 1.0)
            cos, sin = abs(m[0, 0]), abs(m[0, 1])
            nw = int(th * sin + tw * cos)
            nh = int(th * cos + tw * sin)
            m[0, 2] += nw / 2 - cx
            m[1, 2] += nh / 2 - cy
            patch = cv2.warpAffine(tex, m, (nw, nh))
            if ip2[0] > w // 2:
                patch = cv2.flip(patch, 0)
            height = max(int(abs(ip2[1] - ip1[1])), 2)
            width = max(int(abs(ip2[0] - ip1[0])),
                        int(drops["max_width"][i]) + 2)
            patch = cv2.resize(patch, (width, height),
                               interpolation=cv2.INTER_AREA)
            patch = np.clip(patch, 0, 1)
            min_c = ip1.astype(int)

        d_avg = (iw1 + iw2) / 2
        if rendering_strategy in ("white", "naive_db"):
            # Strategy modes: gray texture as-is, no recolor, no defocus
            # (bad_weather.py:349-360 — defocus is physics-branch only).
            rgb = np.repeat(patch[..., None], 3, -1)
            rgba = np.concatenate([rgb, patch[..., None]], -1)
            tmp = min_c
            min_c = np.array([np.clip(tmp[0], 0, w),
                              np.clip(tmp[1], 0, h)])
            delta = min_c - tmp
            rgba = rgba[delta[1]:] if delta[1] >= 0 else rgba[:delta[1]]
            rgba = rgba[:, delta[0]:] if delta[0] >= 0 \
                else rgba[:, :delta[0]]
            if rendering_strategy == "white":
                lo = 1.0
            else:
                lo = d_avg / (float(drops["length"][i]) + d_avg)
        else:
            # FOV polygon -> masked solid-angle-weighted color
            mid = (drops["wp1"][i] + drops["wp2"][i]) / 2.0
            poly = fov_polygon(mid, env.shape)
            me = np.zeros(env.shape[:2])
            cv2.fillConvexPoly(me, np.round(poly).astype(np.int32), 1)
            me = me.astype(bool)
            fov_sa = sa[me]
            fov_env = env_xyY[me]
            fov_sums = (fov_env * fov_sa[:, None]).sum(0)
            xy_avg = fov_sums[:2] / fov_sa.sum()
            avg_fov_lum = fov_sums[2] / total_sa
            drop_Y = 0.94 * avg_fov_lum + 0.06 * ambient

            tex_Y = rgb_to_xyY(np.repeat(patch[..., None], 3, -1))[..., 2]
            col = np.zeros(patch.shape + (3,))
            col[..., 0] = xy_avg[0]
            col[..., 1] = xy_avg[1]
            col[..., 2] = tex_Y * drop_Y
            rgb = xyY_to_rgb(col)
            rgba = np.concatenate([rgb, patch[..., None]], -1)

            # defocus
            o = abs(drops["wp1"][i][2])
            coc = abs(((o - focus_plane) * focal_m ** 2)
                      / (o * (focus_plane - focal_m) * f_number)
                      / coc_pixsize)
            shift = int(10 * coc)
            rgba = np.pad(rgba, ((shift, shift), (shift, shift), (0, 0)))
            rgba = gaussian_filter(rgba, [coc, coc / 2, 0])

            tmp = min_c - shift
            min_c = np.array([np.clip(tmp[0], 0, w),
                              np.clip(tmp[1], 0, h)])
            delta = min_c - tmp
            rgba = rgba[delta[1]:] if delta[1] >= 0 else rgba[:delta[1]]
            rgba = rgba[:, delta[0]:] if delta[0] >= 0 \
                else rgba[:, :delta[0]]

            lo = opacity_attenuation * d_avg / (float(drops["length"][i])
                                                + d_avg)
        tau_one = exposure_s * lo

        y0, x0 = int(min_c[1]), int(min_c[0])
        sl_y = slice(y0, y0 + rgba.shape[0])
        sl_x = slice(x0, x0 + rgba.shape[1])
        region = rainy[sl_y, sl_x]
        vis = rgba[:region.shape[0], :region.shape[1]]
        alpha = vis[..., 3:]
        blended = ((1 - alpha * tau_one / exposure_s) * region
                   + vis[..., :3] * (tau_one / tau_zero))
        rainy[sl_y, sl_x] = np.clip(blended, 0, 1)
        mask[sl_y, sl_x] += vis[..., 3]
        sat_mask[sl_y, sl_x] += np.clip(vis[..., :3], 0, 1)

    diff = rainy.mean() - bg.mean()
    return np.clip(rainy - diff, 0, 1), mask, sat_mask
