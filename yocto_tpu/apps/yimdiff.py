"""yimdiff: image diffing with threshold + signaling exit code
(apps/yimdiff.cpp) — the golden-test comparator."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io.imageio import load_image, save_image
from ..models.image import ImageData, image_difference
from ..utils.cli import exit_error


def main(argv=None):
    cli = argparse.ArgumentParser("yimdiff", description="diff images")
    cli.add_argument("--image1", default="image1.png", help="Input image 1.")
    cli.add_argument("--image2", default="image2.png", help="Input image 2.")
    cli.add_argument("--output", default="", help="Output image.")
    cli.add_argument("--signal", action="store_true", help="Error on diff.")
    cli.add_argument("--threshold", type=float, default=0.0)
    args = cli.parse_args(argv)

    px1, lin1 = load_image(args.image1)
    px2, lin2 = load_image(args.image2)
    a = ImageData(px1.shape[1], px1.shape[0], lin1, px1)
    b = ImageData(px2.shape[1], px2.shape[0], lin2, px2)
    diff = image_difference(a, b, display=bool(args.output))
    if args.output:
        save_image(args.output, diff.pixels, linear=diff.linear)
    if args.signal:
        if np.asarray(diff.pixels).max() > args.threshold:
            exit_error("image content differs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
