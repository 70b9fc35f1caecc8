#!/usr/bin/env python
"""Multi-process render farm — reference ``main_threaded.py`` equivalent.

The reference shards (intensity x frame-window x scene-block) across up
to 10 ``main.py`` subprocesses because its renderer is single-threaded
CPU. In raintpu one device step renders a whole batch, so the farm is
usually unnecessary on one chip — but this driver is still useful to
(a) run several model hosts/chips from one command and (b) keep the
reference's operational surface (per-shard logs, skip-based
idempotency). Shards are (sequence x intensity) units; children run
with ``--conflict_strategy skip --noverbose`` exactly like the
reference (``main_threaded.py:122-129``).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def build_shards(args, passthrough):
    """(intensity x frame-window x scene-block) shard enumeration —
    the reference's three axes (``main_threaded.py:103-154``; its
    defaults were frames_per_thread=41, 25 scenes/shard). Frame windows
    require ``--frame_end`` so the range is known without touching the
    dataset."""
    seqs = args.sequences.split(",") if args.sequences else [""]
    fpt = getattr(args, "frames_per_thread", 0) or 0
    f0 = getattr(args, "frame_start", 0) or 0
    f1 = getattr(args, "frame_end", None)
    if fpt > 0:
        if f1 is None:
            raise SystemExit(
                "--frames_per_thread requires --frame_end (the farm "
                "can't discover sequence lengths without rendering)")
        windows = [(w, min(w + fpt, f1)) for w in range(f0, f1, fpt)]
    else:
        windows = [None]

    shards = []
    for intensity in args.intensity.split(","):
        for win in windows:
            for i in range(0, len(seqs), args.scenes_per_thread):
                block = seqs[i:i + args.scenes_per_thread]
                cmd = [sys.executable, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "main.py"),
                    "--dataset", args.dataset,
                    "--intensity", intensity,
                    "--conflict_strategy", "skip", "--noverbose"]
                if any(block):
                    cmd += ["--sequences", ",".join(block)]
                tag = f"i{intensity}_s{i}"
                if win is not None:
                    cmd += ["--frame_start", str(win[0]),
                            "--frame_end", str(win[1])]
                    tag += f"_f{win[0]}"
                else:
                    # No frame sharding: forward the plain bounds.
                    if f0:
                        cmd += ["--frame_start", str(f0)]
                    if f1 is not None:
                        cmd += ["--frame_end", str(f1)]
                cmd += passthrough
                shards.append((tag, cmd))
    return shards


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("-i", "--intensity", default="25")
    ap.add_argument("-s", "--sequences", default="")
    ap.add_argument("--max_threads", type=int, default=4,
                    help="Concurrent child renderers (reference used 10 "
                         "CPU workers; device-bound children need fewer)")
    ap.add_argument("--scenes_per_thread", type=int, default=25)
    ap.add_argument("--frames_per_thread", type=int, default=0,
                    help="Also shard each sequence into frame windows of "
                         "this many frames (reference default 41; needs "
                         "--frame_end). 0 = no frame sharding.")
    ap.add_argument("--frame_start", type=int, default=0)
    ap.add_argument("--frame_end", type=int, default=None)
    ap.add_argument("--log_dir", default=".")
    args, passthrough = ap.parse_known_args(argv)

    shards = build_shards(args, passthrough)
    print(f"{len(shards)} shard(s), {args.max_threads} concurrent")

    running = []  # (tag, Popen, log_fh, err_fh)
    pending = list(shards)
    failed = []
    while pending or running:
        while pending and len(running) < args.max_threads:
            tag, cmd = pending.pop(0)
            log = open(os.path.join(args.log_dir,
                                    f"automate_log_{tag}.txt"), "w")
            err = open(os.path.join(args.log_dir,
                                    f"automate_error_{tag}.txt"), "w")
            print(f"START {tag}: {' '.join(cmd)}")
            running.append((tag, subprocess.Popen(
                cmd, stdout=log, stderr=err), log, err))
        time.sleep(2)
        still = []
        for tag, proc, log, err in running:
            rc = proc.poll()
            if rc is None:
                still.append((tag, proc, log, err))
                continue
            log.close()
            err.close()
            print(f"END {tag} (exit {rc})")
            if rc != 0:
                failed.append(tag)
        running = still

    if failed:
        print(f"{len(failed)} shard(s) failed: {failed} — rerun; 'skip' "
              "strategy resumes where they stopped.")
        return 1
    print("All shards completed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
