"""ysamples: sample shape points / grow hairs (apps/ysamples.cpp)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io.sceneio import load_shape, save_shape
from ..models.sampleshape import eval_position, make_hair2, sample_shape
from ..models.shape import ShapeData
from ..utils.cli import SimpleTimer, print_info


def main(argv=None):
    cli = argparse.ArgumentParser("ysamples", description="sample shapes")
    cli.add_argument("--shape", default="shape.ply", help="input shape")
    cli.add_argument("--output", default="out.ply", help="output shape")
    cli.add_argument("--ashairs", action="store_true", help="as hairs")
    cli.add_argument("--samples", type=int, default=4096)
    cli.add_argument("--hairs", type=int, default=65536)
    cli.add_argument("--steps", type=int, default=8)
    cli.add_argument("--length", type=float, default=0.02)
    cli.add_argument("--noise", type=float, default=0.001)
    cli.add_argument("--gravity", type=float, default=0.0005)
    cli.add_argument("--radius", type=float, default=0.0001)
    args = cli.parse_args(argv)

    with SimpleTimer("load shape"):
        shape = load_shape(args.shape)

    if not args.ashairs:
        points = sample_shape(shape, args.samples)
        sshape = ShapeData(
            points=np.arange(len(points), dtype=np.int32),
            positions=np.stack([eval_position(shape, e, uv)
                                for e, uv in points]).astype(np.float32),
            radius=np.full(len(points), args.radius * 10, np.float32))
        save_shape(args.output, sshape)
    else:
        sshape = make_hair2(shape, (args.steps, args.hairs),
                            (args.length, args.length),
                            (args.radius, args.radius), args.noise,
                            args.gravity)
        save_shape(args.output, sshape, ascii_fmt=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
