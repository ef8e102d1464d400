"""Per-pass pipeline breakdown ONLY (no checkerboard/di variants):
the lean probe for the VERDICT r3 #3 overhead attack. Prints the
run_pipeline dict with per_pass_ms.

Run from /root/repo:  timeout 3000 python scripts/pp_only.py [--di]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--di", action="store_true",
                    help="flagship DI+GI variant")
    ap.add_argument("--scene", default="ladder")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import bench

    bench.enable_compile_cache()
    out = bench.run_pipeline(
        width=args.width, height=args.height, frames=args.frames,
        scene_kind=args.scene, backend="auto", per_pass=True,
        enable_di=args.di)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
