"""Smoke test for the per-stage anatomy profiler (tools/stage_profile):
all four stage programs must compile, run and produce finite timings on
a tiny scene. Guards the tool against pipeline-signature drift so it is
runnable the moment TPU measurement is needed."""

import json

from raintpu.tools.stage_profile import main


def test_stage_profile_smoke(capsys):
    main(["--batch", "1", "--iters", "1", "--reps", "1",
          "--hw", "96", "160", "--capacity", "64", "--json"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert set(rec["ms_per_step"]) == {"fog", "fog+envmap", "bg",
                                       "prep_photo", "prep_geom",
                                       "prep", "fields", "full"}
    assert all(v > 0 for v in rec["ms_per_step"].values())
