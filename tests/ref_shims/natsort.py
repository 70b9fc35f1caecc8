"""Minimal natsort shim (natural-order sort), enough for the
reference's my_utils.os_listdir."""

import re

_CHUNK = re.compile(r"(\d+)")


def _key(s):
    return [int(t) if t.isdigit() else t.lower()
            for t in _CHUNK.split(str(s))]


def natsorted(seq, key=None):
    if key is None:
        return sorted(seq, key=_key)
    return sorted(seq, key=lambda x: _key(key(x)))
