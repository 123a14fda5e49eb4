"""Packed-gather fast paths must be BIT-identical to the reference-shaped
slow paths (the lockstep renderer's golden parity rides on them).

- tex_quad: one [N,16] 2x2-quad row per bilinear lookup vs four [N,4]
  taps (eval_texture, yocto_scene.cpp:111-178 semantics).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from yocto_tpu.models.scene import SceneData, TextureData
from yocto_tpu.trace.compile import compile_scene
from yocto_tpu.trace.sceneval import eval_texture


def _scene_with_textures():
    rng = np.random.RandomState(7)
    scene = SceneData()
    # mixed sizes, wrap + clamp, srgb + linear, nearest + bilinear
    for (w, h, linear, nearest, clamp) in [
            (8, 4, True, False, False),
            (5, 7, False, False, True),     # non-pow2, clamp, srgb
            (16, 16, False, True, False),   # nearest
            (1, 1, True, False, False)]:
        px = rng.rand(h * w, 4).astype(np.float32)
        scene.textures.append(TextureData(
            width=w, height=h, linear=linear, nearest=nearest,
            clamp=clamp, pixelsf=px))
    return scene


@pytest.mark.parametrize("as_linear", [True, False])
def test_tex_quad_bitwise_matches_4tap(as_linear):
    scene = _scene_with_textures()
    flat = compile_scene(scene)
    assert flat.tex_quad is not None
    flat_np = flat._replace(tex_quad=None)

    rng = np.random.RandomState(3)
    n = 512
    uv = jnp.asarray((rng.rand(n, 2) * 4.0 - 2.0).astype(np.float32))
    tex_id = jnp.asarray(rng.randint(-1, len(scene.textures), n,
                                     dtype=np.int32))
    packed = eval_texture(flat, tex_id, uv, as_linear=as_linear)
    fourtap = eval_texture(flat_np, tex_id, uv, as_linear=as_linear)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(fourtap))

def test_surface_rows_bitwise_matches_split_gathers():
    """cand_attrs packed-row evals vs the split-table evals: bit-identical
    position/normal/material on a textured corpus-class scene (features1:
    uvgrid + normal map + glass + metal + env)."""
    from yocto_tpu.models.testscenes import make_test_scene
    from yocto_tpu.trace.compile import scene_features
    from yocto_tpu.trace.sceneval import (eval_material, eval_position,
                                          eval_shading_normal,
                                          gather_surface_rows)

    scene = make_test_scene("features1")
    flat = compile_scene(scene)
    assert flat.cand_attrs is not None
    feat = scene_features(scene)

    rng = np.random.RandomState(11)
    n = 256
    ncand = int(np.asarray(flat.cand_inst).shape[0])
    cand = rng.randint(0, ncand, n)
    inst = jnp.asarray(np.asarray(flat.cand_inst)[cand])
    gelem = jnp.asarray(np.asarray(flat.cand_elem)[cand])
    elem_l = gelem - flat.shape_elem_start[flat.inst_shape[inst]]
    uv = jnp.asarray(rng.rand(n, 2).astype(np.float32))
    out = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)

    rows = gather_surface_rows(flat, inst, elem_l)
    assert rows is not None

    p_packed = eval_position(flat, inst, None, uv, rows=rows)
    p_split = eval_position(flat, inst, gelem, uv)
    np.testing.assert_array_equal(np.asarray(p_packed), np.asarray(p_split))

    n_packed = eval_shading_normal(flat, inst, None, uv, out,
                                   features=feat, rows=rows)
    n_split = eval_shading_normal(flat, inst, gelem, uv, out, features=feat)
    np.testing.assert_array_equal(np.asarray(n_packed), np.asarray(n_split))

    m_packed = eval_material(flat, inst, None, uv, features=feat, rows=rows)
    m_split = eval_material(flat, inst, gelem, uv, features=feat)
    for field, a, b in zip(m_packed._fields, m_packed, m_split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=field)
