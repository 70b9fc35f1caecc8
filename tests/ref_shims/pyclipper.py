"""Minimal pyclipper shim for running the reference code in-tree.

The reference uses pyclipper for exactly one operation
(/root/reference/common/bad_weather.py:363-374): intersecting the
drop-FOV polygon (PT_CLIP) with the environment-map rectangle
(PT_SUBJECT). This shim reproduces that via Sutherland-Hodgman
clipping of the FOV polygon against the (convex) rectangle — the
intersection region is identical, which is all the caller uses (the
polygon is immediately rasterized with cv2.fillConvexPoly).

Like the real pyclipper (Clipper works on int64 coords), input
coordinates are truncated to integers and the output vertices are
integral.
"""

PT_CLIP = 0
PT_SUBJECT = 1
CT_INTERSECTION = 0
PFT_NONZERO = 1
PFT_EVENODD = 0


def _as_int_path(path):
    return [(int(x), int(y)) for (x, y) in path]


def _signed_area(poly):
    a = 0.0
    n = len(poly)
    for i in range(n):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % n]
        a += x0 * y1 - x1 * y0
    return a / 2.0


def _clip_edge(poly, a, b, inside_sign):
    """Keep the side of directed edge a->b indicated by inside_sign."""
    out = []
    n = len(poly)
    if n == 0:
        return out
    ax, ay = a
    bx, by = b

    def side(p):
        return (bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax)

    for i in range(n):
        cur = poly[i]
        nxt = poly[(i + 1) % n]
        sc = side(cur) * inside_sign
        sn = side(nxt) * inside_sign
        if sc >= 0:
            out.append(cur)
        if (sc < 0) != (sn < 0):
            # segment crosses the edge line: add the intersection at
            # t where side(cur + t*(nxt-cur)) == 0
            t = sc / (sc - sn)
            out.append((cur[0] + t * (nxt[0] - cur[0]),
                        cur[1] + t * (nxt[1] - cur[1])))
    return out


def _sutherland_hodgman(subject, convex_clip):
    poly = list(subject)
    sign = 1.0 if _signed_area(convex_clip) > 0 else -1.0
    n = len(convex_clip)
    for i in range(n):
        poly = _clip_edge(poly, convex_clip[i], convex_clip[(i + 1) % n],
                          sign)
        if not poly:
            return []
    return poly


class Pyclipper:
    def __init__(self):
        self._clip = None
        self._subject = None

    def AddPath(self, path, poly_type, closed=True):
        pts = _as_int_path(path)
        if poly_type == PT_CLIP:
            self._clip = pts
        else:
            self._subject = pts

    def Execute(self, clip_type, subj_fill=PFT_NONZERO,
                clip_fill=PFT_NONZERO):
        assert clip_type == CT_INTERSECTION, "shim supports intersection"
        assert self._clip is not None and self._subject is not None
        # The caller's subject is the envmap rectangle (always convex);
        # clip the FOV polygon against it — same intersection region.
        poly = _sutherland_hodgman(self._clip, self._subject)
        if not poly:
            return []
        return [[[int(round(x)), int(round(y))] for (x, y) in poly]]
