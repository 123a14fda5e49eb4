"""yconvert: scene conversion + info/validate (apps/yconvert.cpp)."""

from __future__ import annotations

import argparse
import sys

from ..io.sceneio import load_scene, save_scene
from ..models.scene import scene_stats, scene_validation
from ..utils.cli import SimpleTimer, print_info


def main(argv=None):
    cli = argparse.ArgumentParser("yconvert", description="convert scene")
    cli.add_argument("--scene", default="scene.json", help="input scene")
    cli.add_argument("--output", default="out.json", help="output scene")
    cli.add_argument("--info", action="store_true", help="print info")
    cli.add_argument("--validate", action="store_true", help="run validate")
    cli.add_argument("--copyright", default="", help="set scene copyright")
    args = cli.parse_args(argv)

    print_info(f"converting {args.scene}")
    with SimpleTimer("load scene"):
        scene = load_scene(args.scene)
    if args.copyright:
        scene.copyright = args.copyright
    if args.info:
        print_info("scene stats ------------")
        for stat in scene_stats(scene):
            print_info(stat)
    if args.validate:
        for error in scene_validation(scene):
            print(f"error: {error}", file=sys.stderr)
    with SimpleTimer("save scene"):
        save_scene(args.output, scene)
    return 0


if __name__ == "__main__":
    sys.exit(main())
