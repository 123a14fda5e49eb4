"""ycolorgrade: color grading (apps/ycolorgrade.cpp)."""

from __future__ import annotations

import argparse
import json
import sys

from ..io.imageio import load_image, save_image
from ..models.image import ImageData, colorgrade_image
from ..ops.color import ColorgradeParams
from ..utils.cli import SimpleTimer


def load_colorgrade_params(path: str) -> ColorgradeParams:
    with open(path) as f:
        doc = json.load(f)
    params = ColorgradeParams()
    for key, val in doc.items():
        if hasattr(params, key):
            setattr(params, key, tuple(val) if isinstance(val, list)
                    else val)
    return params


def save_colorgrade_params(path: str, params: ColorgradeParams) -> None:
    defaults = ColorgradeParams()
    doc = {}
    for key in vars(defaults):
        val = getattr(params, key)
        if val != getattr(defaults, key):
            doc[key] = list(val) if isinstance(val, tuple) else val
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)


def main(argv=None):
    cli = argparse.ArgumentParser("ycolorgrade",
                                  description="adjust image colors")
    cli.add_argument("--image", default="image.png", help="Input image.")
    cli.add_argument("--output", default="out.png", help="Output image.")
    cli.add_argument("--params", default="", help="params filename")
    cli.add_argument("--dumpparams", default="", help="dump params filename")
    cli.add_argument("--interactive", action="store_true",
                     help="open the web editor (apps/ycolorgrade.cpp:50-150)")
    cli.add_argument("--port", type=int, default=8080)
    args = cli.parse_args(argv)

    params = ColorgradeParams()
    if args.params:
        params = load_colorgrade_params(args.params)
    if args.dumpparams:
        save_colorgrade_params(args.dumpparams, params)

    with SimpleTimer("load image"):
        pixels, linear = load_image(args.image)
    image = ImageData(pixels.shape[1], pixels.shape[0], linear, pixels)
    if args.interactive:
        from .igrade import serve_grade
        serve_grade(image.pixels, image.linear, port=args.port,
                    title="ycolorgrade")
        return 0
    graded = colorgrade_image(image, params)
    with SimpleTimer("save image"):
        save_image(args.output, graded.pixels, linear=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
