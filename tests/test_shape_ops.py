"""Skinning, hash-grid KNN, vertex welding (yocto_shape.h:333-618)."""

import numpy as np

from yocto_tpu.models.shape import (find_neighbors, insert_vertex,
                                    make_hash_grid, skin_matrices,
                                    skin_vertices, weld_triangles,
                                    weld_vertices)


def test_weld_vertices_and_triangles():
    pos = np.array([[0, 0, 0], [0.0005, 0, 0], [1, 0, 0], [1.0004, 0, 0],
                    [2, 2, 2]], np.float32)
    wpos, idx = weld_vertices(pos, 0.001)
    assert len(wpos) == 3
    assert idx.tolist() == [0, 0, 1, 1, 2]
    tris = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    wt, wp = weld_triangles(tris, pos, 0.001)
    assert wt.tolist() == [[0, 0, 1], [1, 1, 2]]
    assert len(wp) == 3


def test_hash_grid_neighbors():
    pos = np.array([[0, 0, 0], [0.05, 0, 0], [1, 0, 0], [2, 2, 2]],
                   np.float32)
    g = make_hash_grid(pos, 0.5)
    assert find_neighbors(g, [0, 0, 0], 0.1) == [0, 1]
    assert find_neighbors(g, [1, 0, 0], 0.1) == [2]
    assert find_neighbors(g, [5, 5, 5], 0.1) == []
    v = insert_vertex(g, [5, 5, 5])
    assert find_neighbors(g, [5, 5, 5], 0.1) == [v]


def test_skinning_identity_and_translation():
    rng = np.random.RandomState(0)
    n = 6
    p = rng.rand(n, 3).astype(np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (n, 1))
    w = np.zeros((n, 4), np.float32)
    w[:, 0] = 1
    j = np.zeros((n, 4), np.int64)
    frames = np.array([[[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0, 0]]],
                      np.float32)
    sp, sn = skin_vertices(p, nrm, w, j, frames)
    np.testing.assert_allclose(sp, p + [0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(sn, nrm, atol=1e-6)

    mats = np.array([np.eye(4)], np.float32)
    mats[0][:3, 3] = [0, 1, 0]
    sp2, sn2 = skin_matrices(p, nrm, w, j, mats)
    np.testing.assert_allclose(sp2, p + [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(sn2, nrm, atol=1e-6)


def test_skinning_blend_two_joints():
    # a vertex weighted 50/50 between identity and a +x translation ends
    # up halfway (frame skinning blends transformed points)
    p = np.array([[1, 2, 3]], np.float32)
    nrm = np.array([[1, 0, 0]], np.float32)
    w = np.array([[0.5, 0.5, 0, 0]], np.float32)
    j = np.array([[0, 1, 0, 0]], np.int64)
    frames = np.array([
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]],
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [2, 0, 0]]], np.float32)
    sp, sn = skin_vertices(p, nrm, w, j, frames)
    np.testing.assert_allclose(sp, [[2, 2, 3]], atol=1e-6)
