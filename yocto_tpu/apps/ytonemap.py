"""ytonemap: image conversion/resize/tonemap (apps/ytonemap.cpp)."""

from __future__ import annotations

import argparse
import sys

from ..io.imageio import is_hdr_filename, load_image, save_image
from ..models.image import ImageData, resize_image, tonemap_image
from ..utils.cli import SimpleTimer, print_info


def main(argv=None):
    cli = argparse.ArgumentParser("ytonemap", description="tonemap image")
    cli.add_argument("--image", default="image.png", help="Input image.")
    cli.add_argument("--output", default="out.png", help="Output image.")
    cli.add_argument("--exposure", type=float, default=0.0)
    cli.add_argument("--filmic", action="store_true")
    cli.add_argument("--width", type=int, default=0)
    cli.add_argument("--height", type=int, default=0)
    cli.add_argument("--interactive", action="store_true",
                     help="open the web editor (apps/ytonemap.cpp:60-125)")
    cli.add_argument("--port", type=int, default=8080)
    args = cli.parse_args(argv)

    with SimpleTimer("load image"):
        pixels, linear = load_image(args.image)
    image = ImageData(pixels.shape[1], pixels.shape[0], linear, pixels)
    if args.width or args.height:
        image = resize_image(image, args.width, args.height)
    if args.interactive:
        from .igrade import serve_grade
        serve_grade(image.pixels, image.linear, port=args.port,
                    tonemap_only=True, title="ytonemap")
        return 0
    if image.linear and not is_hdr_filename(args.output):
        image = tonemap_image(image, args.exposure, args.filmic)
    with SimpleTimer("save image"):
        save_image(args.output, image.pixels, linear=image.linear)
    return 0


if __name__ == "__main__":
    sys.exit(main())
