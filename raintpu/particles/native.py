"""ctypes bindings for the native particle-XML parser.

Builds lazily from ``native/xmlparse.cc`` if the shared library is
absent (g++ is in the image); falls back cleanly to the Python parser
when compilation is impossible. See native/xmlparse.cc for rationale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libraintpu_native.so")

_lib = None
_lib_tried = False


def _stale() -> bool:
    """True when the .so is absent or older than its sources (a stale
    binary would silently shadow source fixes)."""
    if not os.path.exists(_LIB_PATH):
        return True
    so_mtime = os.path.getmtime(_LIB_PATH)
    for name in ("xmlparse.cc", "Makefile"):
        src = os.path.join(_NATIVE_DIR, name)
        if os.path.exists(src) and os.path.getmtime(src) > so_mtime:
            return True
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if _stale():
        src = os.path.join(_NATIVE_DIR, "xmlparse.cc")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["make", "-B", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.rt_parse_xml.restype = ctypes.c_void_p
    lib.rt_parse_xml.argtypes = [ctypes.c_char_p]
    lib.rt_error.restype = ctypes.c_char_p
    lib.rt_error.argtypes = [ctypes.c_void_p]
    lib.rt_num_frames.restype = ctypes.c_int32
    lib.rt_num_frames.argtypes = [ctypes.c_void_p]
    lib.rt_frame_info.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                  ctypes.POINTER(ctypes.c_int32)]
    lib.rt_frame_data.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64)] + \
        [ctypes.POINTER(ctypes.c_double)] * 8
    lib.rt_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_particles_xml_native(path: str) -> List[dict]:
    """Native parse -> same record format as
    xml_io.parse_particles_xml_raw. Raises RuntimeError on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    h = lib.rt_parse_xml(path.encode())
    try:
        err = lib.rt_error(h)
        if err:
            raise RuntimeError(
                f"Reading XML file {path} failed ({err.decode()}); likely "
                "a corrupted particle simulation — delete the simulation "
                "folder and re-run to regenerate.")
        frames = []
        info = (ctypes.c_int32 * 5)()
        for i in range(lib.rt_num_frames(h)):
            lib.rt_frame_info(h, i, info)
            n = int(info[4])
            pid = np.zeros(n, np.int64)
            ip1 = np.zeros((n, 2))
            ip2 = np.zeros((n, 2))
            iw1 = np.zeros(n)
            iw2 = np.zeros(n)
            wp1 = np.zeros((n, 3))
            wp2 = np.zeros((n, 3))
            wd1 = np.zeros(n)
            wd2 = np.zeros(n)
            if n:
                lib.rt_frame_data(
                    h, i,
                    pid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
                      for a in (ip1, ip2, iw1, iw2, wp1, wp2, wd1, wd2)])
            frames.append({
                "id": int(info[0]), "exposure": int(info[1]),
                "start": int(info[2]), "count": int(info[3]),
                "pid": pid, "ip1": ip1, "ip2": ip2, "iw1": iw1,
                "iw2": iw2, "wp1": wp1, "wp2": wp2,
                "wd1": wd1, "wd2": wd2,
            })
        return frames
    finally:
        lib.rt_free(h)
