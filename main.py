#!/usr/bin/env python
"""CLI entry point, flag-compatible with the reference main.py.

    python main.py --dataset kitti --intensity 25 ...

See raintpu/cli.py for the full flag set (plus raintpu additions:
--online, --export_xml, --batch_size, --drop_capacity, --seed).
"""

from raintpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
