"""yimalpha: alpha-channel surgery (apps/yimalpha.cpp)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io.imageio import load_image, save_image
from ..ops.color import luminance
from ..utils.cli import exit_error


def main(argv=None):
    cli = argparse.ArgumentParser("yimalpha",
                                  description="set image alpha")
    cli.add_argument("--image", default="image.png", help="Input image")
    cli.add_argument("--alpha", default="alpha.png", help="Alpha image")
    cli.add_argument("--output", default="out.png", help="Output image")
    cli.add_argument("--from-color", dest="from_color", action="store_true")
    cli.add_argument("--from-black", dest="from_black", action="store_true")
    cli.add_argument("--to-color", dest="to_color", action="store_true")
    args = cli.parse_args(argv)

    pixels, linear = load_image(args.image)
    alpha_px, alpha_lin = load_image(args.alpha)
    if pixels.shape[:2] != alpha_px.shape[:2]:
        exit_error("image and alpha must have the same size")
    if linear != alpha_lin:
        exit_error("image and alpha must be both hdr or ldr")

    out = pixels.copy()
    import jax.numpy as jnp
    if args.from_color:
        out[..., 3] = np.asarray(luminance(jnp.asarray(alpha_px[..., :3])))
    elif args.from_black:
        lum = np.asarray(luminance(jnp.asarray(alpha_px[..., :3])))
        out[..., 3] = (lum > 0.001).astype(np.float32)
    else:
        out[..., 3] = alpha_px[..., 3]
    if args.to_color:
        out[..., 0] = out[..., 3]
        out[..., 1] = out[..., 3]
        out[..., 2] = out[..., 3]
    save_image(args.output, out, linear=linear)
    return 0


if __name__ == "__main__":
    sys.exit(main())
