import sys

sys.path.insert(0, "/root/repo")

from main_threaded import build_shards


class NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_build_shards_intensity_x_scenes():
    args = NS(dataset="kitti", intensity="5,25",
              sequences="a,b,c", scenes_per_thread=2)
    shards = build_shards(args, ["--extra", "1"])
    # 2 intensities x ceil(3/2) scene blocks = 4 shards
    assert len(shards) == 4
    tags = [t for t, _ in shards]
    assert tags == ["i5_s0", "i5_s2", "i25_s0", "i25_s2"]
    for _tag, cmd in shards:
        assert "--conflict_strategy" in cmd and "skip" in cmd
        assert "--noverbose" in cmd
        assert cmd[-2:] == ["--extra", "1"]


def test_build_shards_no_sequences():
    args = NS(dataset="toy", intensity="10", sequences="",
              scenes_per_thread=25)
    shards = build_shards(args, [])
    assert len(shards) == 1
    assert "--sequences" not in shards[0][1]


def test_build_shards_frame_windows():
    """The reference's third shard axis (main_threaded.py:103-154):
    frame windows of --frames_per_thread frames."""
    args = NS(dataset="kitti", intensity="5,25", sequences="a,b,c",
              scenes_per_thread=2, frames_per_thread=41,
              frame_start=0, frame_end=100)
    shards = build_shards(args, [])
    # 2 intensities x 3 windows (0-41, 41-82, 82-100) x 2 scene blocks
    assert len(shards) == 12
    tags = [t for t, _ in shards]
    assert "i5_s0_f0" in tags and "i5_s0_f41" in tags \
        and "i5_s0_f82" in tags
    by_tag = dict(shards)
    cmd = by_tag["i25_s2_f41"]
    i = cmd.index("--frame_start")
    assert cmd[i + 1] == "41"
    assert cmd[cmd.index("--frame_end") + 1] == "82"
    # Last window clips to frame_end.
    cmd = by_tag["i5_s0_f82"]
    assert cmd[cmd.index("--frame_end") + 1] == "100"


def test_build_shards_frame_bounds_forwarded_without_windows():
    args = NS(dataset="toy", intensity="10", sequences="",
              scenes_per_thread=25, frames_per_thread=0,
              frame_start=5, frame_end=9)
    (_tag, cmd), = build_shards(args, [])
    assert cmd[cmd.index("--frame_start") + 1] == "5"
    assert cmd[cmd.index("--frame_end") + 1] == "9"


def test_frames_per_thread_requires_frame_end():
    import pytest

    args = NS(dataset="toy", intensity="10", sequences="",
              scenes_per_thread=25, frames_per_thread=10,
              frame_start=0, frame_end=None)
    with pytest.raises(SystemExit, match="frame_end"):
        build_shards(args, [])


def test_scheduler_runs_shards_and_reports_failures(tmp_path,
                                                    monkeypatch):
    """Drive the scheduler loop with mock children: logs written,
    concurrency respected, nonzero exits collected."""
    import main_threaded as mt

    calls = []

    def fake_shards(args, passthrough):
        ok = [sys.executable, "-c",
              "import sys; print('child ok'); sys.exit(0)"]
        bad = [sys.executable, "-c", "import sys; sys.exit(3)"]
        return [("s0", ok), ("s1", bad), ("s2", ok)]

    monkeypatch.setattr(mt, "build_shards", fake_shards)
    monkeypatch.setattr(mt.time, "sleep", lambda s: None)
    rc = mt.main(["--dataset", "toy", "--max_threads", "2",
                  "--log_dir", str(tmp_path)])
    assert rc == 1  # one shard failed
    logs = sorted(p.name for p in tmp_path.iterdir())
    assert "automate_log_s0.txt" in logs
    assert "automate_error_s1.txt" in logs
    assert "child ok" in (tmp_path / "automate_log_s0.txt").read_text()

    def all_ok(args, passthrough):
        return [("a", [sys.executable, "-c", "pass"])]

    monkeypatch.setattr(mt, "build_shards", all_ok)
    assert mt.main(["--dataset", "toy", "--log_dir", str(tmp_path)]) == 0
