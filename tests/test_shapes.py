"""Procedural shapes + subdivision vs oracles dumped from the reference
library (tests/oracle_shapes/*.ply, saved with the reference's own
save_shape)."""

import os

import numpy as np
import pytest

from yocto_tpu.io.ply import load_shape_ply
from yocto_tpu.models import procedural as P
from yocto_tpu.models.subdivide import (subdivide_catmullclark,
                                        subdivide_quads,
                                        subdivide_triangles)

ORACLES = os.path.join(os.path.dirname(__file__), "oracle_shapes")


def _load(name):
    # the oracle dump used the reference save_shape, which flips texcoords
    # on write; loading with flip=True round-trips to the original values
    return load_shape_ply(os.path.join(ORACLES, name + ".ply"),
                          flip_texcoord=True)


def _norm_elems(shape):
    """The reference saves quads (incl. degenerate) while our makers produce
    quads too; compare as position multisets per element."""
    if len(shape.quads):
        return shape.positions[shape.quads]
    return shape.positions[shape.triangles]


@pytest.mark.parametrize("name,maker", [
    ("rect", lambda: P.make_rect((4, 4), (1, 1), (1, 1))),
    ("box", lambda: P.make_box((2, 2, 2), (1, 1, 1), (1, 1, 1))),
    ("sphere", lambda: P.make_sphere(8, 1.0, 1.0)),
    ("uvsphere", lambda: P.make_uvsphere((8, 8), 1.0, (1, 1))),
    ("disk", lambda: P.make_disk(8, 1.0, 1.0)),
    ("floor", lambda: P.make_floor((2, 2), (10, 10), (10, 10))),
    ("uvcylinder", lambda: P.make_uvcylinder((8, 4, 4), (1, 1), (1, 1, 1))),
    ("geosphere", lambda: P.make_geosphere(1.0, 1)),
    ("bulged_rect", lambda: P.make_bulged_rect((4, 4), (1, 1), (1, 1), 0.3)),
    ("capped_uvsphere",
     lambda: P.make_capped_uvsphere((8, 8), 1.0, (1, 1), 0.3)),
    ("monkey", lambda: P.make_monkey(1.0, 0)),
])
def test_procedural_matches_reference(name, maker):
    ref = _load(name)
    ours = maker()
    assert len(ours.positions) == len(ref.positions), name
    np.testing.assert_allclose(ours.positions, ref.positions, atol=2e-6)
    if len(ref.normals):
        np.testing.assert_allclose(ours.normals, ref.normals, atol=2e-5)
    if len(ref.texcoords) and len(ours.texcoords):
        np.testing.assert_allclose(ours.texcoords, ref.texcoords, atol=2e-6)
    if len(ref.quads):
        np.testing.assert_array_equal(ours.quads, ref.quads)
    if len(ref.triangles):
        np.testing.assert_array_equal(ours.triangles, ref.triangles)


def test_lines_matches_reference():
    ref = _load("lines")
    ours = P.make_lines((16, 4), (1, 1), (1, 1), (0.01, 0.01))
    np.testing.assert_allclose(ours.positions, ref.positions, atol=1e-6)
    np.testing.assert_array_equal(ours.lines, ref.lines)
    np.testing.assert_allclose(ours.radius, ref.radius, atol=1e-7)


def test_subdivide_quads_matches_reference():
    ref = _load("lin_cube_2")
    cube = P.make_box((1, 1, 1), (1, 1, 1), (1, 1, 1))
    quads, pos = subdivide_quads(cube.quads, cube.positions, 2)
    assert len(pos) == len(ref.positions)
    np.testing.assert_allclose(pos, ref.positions, atol=1e-6)
    np.testing.assert_array_equal(quads, ref.quads)


def test_subdivide_catmullclark_matches_reference():
    ref = _load("cc_cube_2")
    cube = P.make_box((1, 1, 1), (1, 1, 1), (1, 1, 1))
    quads, pos = subdivide_catmullclark(cube.quads, cube.positions, 2)
    assert len(pos) == len(ref.positions)
    np.testing.assert_allclose(pos, ref.positions, atol=1e-5)
    np.testing.assert_array_equal(quads, ref.quads)


def test_subdivide_triangles_matches_reference():
    ref = _load("lin_geo_2")
    gs = P.make_geosphere(1.0, 0)
    tris, pos = subdivide_triangles(gs.triangles, gs.positions, 2)
    assert len(pos) == len(ref.positions)
    np.testing.assert_allclose(pos, ref.positions, atol=1e-6)
    np.testing.assert_array_equal(tris, ref.triangles)
