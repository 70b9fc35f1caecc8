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
