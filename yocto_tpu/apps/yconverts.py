"""yconverts: shape conversion (apps/yconverts.cpp): facevarying/smooth/
facet/triangulate/transform/subdivide/to-edges/to-vertices."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io.sceneio import load_shape, save_shape
from ..models.shape import (ShapeData, compute_normals, quads_to_triangles,
                            shape_stats)
from ..models.subdivide import subdivide_shape
from ..utils.cli import SimpleTimer, print_info


def main(argv=None):
    cli = argparse.ArgumentParser("yconverts", description="convert shape")
    cli.add_argument("--shape", default="shape.ply", help="input shape")
    cli.add_argument("--output", default="out.ply", help="output shape")
    cli.add_argument("--facevarying", action="store_true")
    cli.add_argument("--smooth", action="store_true", help="smooth normals")
    cli.add_argument("--facet", action="store_true", help="facet normals")
    cli.add_argument("--aspositions", action="store_true",
                     help="remove all but positions")
    cli.add_argument("--astriangles", action="store_true",
                     help="convert to triangles")
    cli.add_argument("--translate", type=float, nargs=3, default=[0, 0, 0])
    cli.add_argument("--scale", type=float, nargs=3, default=[1, 1, 1])
    cli.add_argument("--rotate", type=float, nargs=3, default=[0, 0, 0])
    cli.add_argument("--subdivisions", type=int, default=0)
    cli.add_argument("--catmullclark", action="store_true")
    cli.add_argument("--toedges", action="store_true")
    cli.add_argument("--tovertices", action="store_true")
    args = cli.parse_args(argv)

    print_info(f"converting {args.shape}")
    with SimpleTimer("load shape"):
        shape = load_shape(args.shape)

    if args.facet:
        shape.normals = np.zeros((0, 3), np.float32)
    if args.aspositions:
        shape = ShapeData(positions=shape.positions, points=shape.points,
                          lines=shape.lines, triangles=shape.triangles,
                          quads=shape.quads)
    if args.astriangles and len(shape.quads):
        shape.triangles = quads_to_triangles(shape.quads)
        shape.quads = np.zeros((0, 4), np.int32)
    if args.subdivisions:
        shape = subdivide_shape(shape, args.subdivisions, args.catmullclark)
    if args.smooth:
        shape.normals = compute_normals(shape)
    # transform
    if (args.translate != [0, 0, 0] or args.scale != [1, 1, 1]
            or args.rotate != [0, 0, 0]):
        pos = shape.positions * np.asarray(args.scale, np.float32)
        for axis, angle in enumerate(args.rotate):
            if angle == 0:
                continue
            a = np.radians(angle)
            c, s = np.cos(a), np.sin(a)
            if axis == 0:
                rot = np.array([[1, 0, 0], [0, c, s], [0, -s, c]])
            elif axis == 1:
                rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
            else:
                rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
            pos = pos @ rot.astype(np.float32)
            if len(shape.normals):
                shape.normals = (shape.normals @ rot).astype(np.float32)
        shape.positions = (pos
                           + np.asarray(args.translate, np.float32)).astype(
                               np.float32)
    if args.toedges:
        from ..models.subdivide import make_edge_map_quads, \
            make_edge_map_triangles
        from ..models.procedural import lines_to_cylinders
        if len(shape.triangles):
            edges, _, _ = make_edge_map_triangles(shape.triangles)
        else:
            edges, _, _ = make_edge_map_quads(shape.quads)
        shape = lines_to_cylinders(edges, shape.positions, 4, 0.001)
    if args.tovertices:
        from ..models.procedural import points_to_spheres
        shape = points_to_spheres(shape.positions)

    print_info("shape stats ------------")
    for stat in shape_stats(shape):
        print_info(stat)
    with SimpleTimer("save shape"):
        save_shape(args.output, shape)
    return 0


if __name__ == "__main__":
    sys.exit(main())
