"""Bench infrastructure tests: backend retry, kernel-mode gate, and a
tiny end-to-end bench smoke run (JSON schema + honesty fields).

Round-4 VERDICT items: bench.py must survive transient tunnel outages
(a failing-then-succeeding backend init takes the retry path) and must
disclose the kernel modes that actually ran plus any fallback.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_wait_for_backend_retries_then_succeeds():
    from raintpu.utils.backend import wait_for_backend

    calls = []

    def probe(timeout_s):
        calls.append(timeout_s)
        return "tpu" if len(calls) >= 3 else None

    platform = wait_for_backend(retry_s=60.0, probe_timeout_s=1.0,
                                interval_s=0.0, probe=probe)
    assert platform == "tpu"
    assert len(calls) == 3


def test_wait_for_backend_deadline_raises():
    from raintpu.utils.backend import wait_for_backend

    with pytest.raises(RuntimeError, match="unavailable"):
        wait_for_backend(retry_s=0.0, probe_timeout_s=1.0,
                         interval_s=0.0, probe=lambda t: None)


def test_wait_for_backend_env_override(monkeypatch):
    from raintpu.utils.backend import wait_for_backend

    monkeypatch.setenv("BENCH_BACKEND_RETRY_S", "0")
    with pytest.raises(RuntimeError):
        wait_for_backend(retry_s=9999.0, probe_timeout_s=1.0,
                         interval_s=0.0, probe=lambda t: None)


def _cfg(**kw):
    from raintpu.ops.rasterize import BucketSpec, RasterConfig
    from raintpu.render.camera import CameraSettings, RenderSettings
    from raintpu.render.frame import PipelineConfig

    return PipelineConfig(
        settings=RenderSettings(camera=CameraSettings()),
        image_hw=(96, 256), fallrate=10.0,
        raster=RasterConfig(buckets=(BucketSpec(40, 32, 5, 16),)),
        composite_mode="fused", **kw)


def test_resolve_kernel_modes_noop_off_tpu():
    # On the CPU test backend the interpret path is exact by
    # construction: the gate must not run and cfg passes through.
    from raintpu.render.frame import resolve_kernel_modes

    cfg = _cfg(pair_eval=True, row_strip=True)
    assert resolve_kernel_modes(cfg) is cfg


def test_resolve_kernel_modes_downgrades_on_divergence(monkeypatch):
    import jax

    from raintpu.render import frame as frame_mod
    from raintpu.tools import tpu_selfcheck

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    outcomes = {(True, True): False, (False, False): True}

    def fake_check(pair, row_strip, fields_dtype="float32",
                   narrow_dma=False):
        return outcomes[(pair, row_strip)]

    monkeypatch.setattr(tpu_selfcheck, "kernel_modes_ok", fake_check)
    monkeypatch.setattr(frame_mod, "_MODE_GATE", {})

    cfg = _cfg(pair_eval=True, row_strip=True)
    out = frame_mod.resolve_kernel_modes(cfg)
    assert (out.pair_eval, out.row_strip, out.narrow_dma) == (
        False, False, False)
    report = frame_mod.mode_gate_report()
    assert any(not v["ok"] for v in report.values())

    # Cached: a second resolve must not re-run the (monkeypatched-away)
    # check even if it would now pass.
    outcomes[(True, True)] = True
    out2 = frame_mod.resolve_kernel_modes(cfg)
    assert (out2.pair_eval, out2.row_strip) == (False, False)


def test_resolve_kernel_modes_degrades_dtype(monkeypatch):
    # Measured on v5e: Mosaic's dynamic_rotate is 32-bit-only, so
    # bf16 fields fail to COMPILE in every strip-mode kernel. The
    # gate must degrade modes first, then the dtype, and disclose both.
    import jax

    from raintpu.render import frame as frame_mod
    from raintpu.tools import tpu_selfcheck

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def fake_check(pair, row_strip, fields_dtype="float32",
                   narrow_dma=False):
        if fields_dtype == "bfloat16":
            raise RuntimeError("Rotate with non-32-bit data")
        return True

    monkeypatch.setattr(tpu_selfcheck, "kernel_modes_ok", fake_check)
    monkeypatch.setattr(frame_mod, "_MODE_GATE", {})
    cfg = _cfg(pair_eval=True, row_strip=True, fields_dtype="bfloat16")
    out = frame_mod.resolve_kernel_modes(cfg)
    assert out.fields_dtype == "float32"
    assert (out.pair_eval, out.row_strip) == (False, False)
    report = frame_mod.mode_gate_report()
    assert any("Rotate" in (v["error"] or "") for v in report.values())


def test_resolve_kernel_modes_floor_failure_raises(monkeypatch):
    import jax
    import pytest

    from raintpu.render import frame as frame_mod
    from raintpu.tools import tpu_selfcheck

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(tpu_selfcheck, "kernel_modes_ok",
                        lambda *a, **k: False)
    monkeypatch.setattr(frame_mod, "_MODE_GATE", {})
    cfg = _cfg(pair_eval=True, row_strip=True)
    with pytest.raises(AssertionError):
        frame_mod.resolve_kernel_modes(cfg)


def test_resolve_kernel_modes_keeps_good_modes(monkeypatch):
    import jax

    from raintpu.render import frame as frame_mod
    from raintpu.tools import tpu_selfcheck

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(tpu_selfcheck, "kernel_modes_ok",
                        lambda *a, **k: True)
    monkeypatch.setattr(frame_mod, "_MODE_GATE", {})
    cfg = _cfg(pair_eval=True, row_strip=True)
    out = frame_mod.resolve_kernel_modes(cfg)
    assert (out.pair_eval, out.row_strip) == (True, True)


def test_bench_smoke_json_schema(monkeypatch, capsys):
    """Run the real bench.py main() end-to-end at a tiny config on the
    CPU test backend and check the emitted JSON line carries the
    honesty/disclosure fields the driver record depends on."""
    import raintpu.utils.backend as backend_mod

    monkeypatch.setattr(backend_mod, "wait_for_backend",
                        lambda **k: "cpu")
    monkeypatch.setenv("HW", "96x256")
    monkeypatch.setenv("BATCH", "2")
    monkeypatch.setenv("ITERS", "2")
    monkeypatch.setenv("CAPACITY", "64")

    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    bench.main()

    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    rec = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline", "steady_state",
                "pair_eval", "row_strip", "fields_dtype",
                "fallback_fired", "mode_gate", "ladder"):
        assert key in rec, key
    assert rec["value"] > 0 and rec["steady_state"] > 0
    assert rec["fallback_fired"] is False


def test_gate_cache_persists_across_processes(monkeypatch, tmp_path):
    """The gate verdict persists to RAINTPU_GATE_CACHE (saving the
    multi-minute compiled-vs-interpret check per CLI process), is keyed
    on the source/jax/device fingerprint, honors RAINTPU_GATE_FRESH=1
    (the official bench re-checks hardware), and is disabled entirely
    by an empty path (conftest sets that: monkeypatched fakes must not
    leak into the real user cache)."""
    import jax

    from raintpu.render import frame as frame_mod
    from raintpu.tools import tpu_selfcheck

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    calls = []
    monkeypatch.setattr(tpu_selfcheck, "kernel_modes_ok",
                        lambda *a, **k: calls.append(a) or True)
    cache = str(tmp_path / "gate.json")
    monkeypatch.setenv("RAINTPU_GATE_CACHE", cache)
    monkeypatch.delenv("RAINTPU_GATE_FRESH", raising=False)
    cfg = _cfg(pair_eval=True, row_strip=True)

    monkeypatch.setattr(frame_mod, "_MODE_GATE", {})
    out = frame_mod.resolve_kernel_modes(cfg)
    assert (out.pair_eval, out.row_strip) == (True, True)
    assert len(calls) == 1 and os.path.exists(cache)

    # "New process" (fresh in-process cache): verdict read from disk.
    monkeypatch.setattr(frame_mod, "_MODE_GATE", {})
    frame_mod.resolve_kernel_modes(cfg)
    assert len(calls) == 1

    # The official bench forces a real re-check.
    monkeypatch.setenv("RAINTPU_GATE_FRESH", "1")
    monkeypatch.setattr(frame_mod, "_MODE_GATE", {})
    frame_mod.resolve_kernel_modes(cfg)
    assert len(calls) == 2

    # Empty path disables persistence in both directions.
    monkeypatch.setenv("RAINTPU_GATE_CACHE", "")
    monkeypatch.delenv("RAINTPU_GATE_FRESH", raising=False)
    monkeypatch.setattr(frame_mod, "_MODE_GATE", {})
    frame_mod.resolve_kernel_modes(cfg)
    assert len(calls) == 3
