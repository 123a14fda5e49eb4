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
