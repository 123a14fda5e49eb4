"""Interactive tonemap/colorgrade editor (apps/igrade.py).

Covers the TPU equivalent of show_colorgrade_gui / show_image_gui
(reference yocto_gui.cpp:420,520) and the --interactive branches of
apps/ytonemap.cpp:60-125 / apps/ycolorgrade.cpp:50-150: the fully
traced grading chain must match the static `colorgrade` compile path,
and the GradeServer must re-grade per edit without retracing.
"""

import numpy as np

from yocto_tpu.ops.color import (ColorgradeParams, colorgrade,
                                 colorgrade_dynamic,
                                 colorgrade_params_vector)


def _random_params(rng):
    return ColorgradeParams(
        exposure=float(rng.uniform(-1.5, 1.5)),
        tint=tuple(rng.uniform(0.7, 1.3, 3).astype(float)),
        lincontrast=float(rng.uniform(0.3, 0.7)),
        logcontrast=float(rng.uniform(0.3, 0.7)),
        linsaturation=float(rng.uniform(0.3, 0.7)),
        contrast=float(rng.uniform(0.3, 0.7)),
        saturation=float(rng.uniform(0.3, 0.7)),
        shadows=float(rng.uniform(0.4, 0.6)),
        midtones=float(rng.uniform(0.4, 0.6)),
        highlights=float(rng.uniform(0.4, 0.6)),
        shadows_color=tuple(rng.uniform(0.9, 1.1, 3).astype(float)),
        midtones_color=tuple(rng.uniform(0.9, 1.1, 3).astype(float)),
        highlights_color=tuple(rng.uniform(0.9, 1.1, 3).astype(float)))


def test_colorgrade_dynamic_matches_static():
    """One traced chain with params as DATA == the per-params static
    compile, for random non-default params (linear/filmic variants)."""
    rng = np.random.RandomState(11)
    img = rng.rand(13, 17, 3).astype(np.float32) * 2.0
    for linear in (True, False):
        for filmic in (False, True):
            params = _random_params(rng)
            params.filmic = filmic
            vec = colorgrade_params_vector(params)
            a = np.asarray(colorgrade(img, linear, params))
            b = np.asarray(colorgrade_dynamic(img, linear, vec,
                                              filmic=filmic, srgb=True))
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_colorgrade_dynamic_alpha_passthrough():
    rng = np.random.RandomState(3)
    img = rng.rand(5, 6, 4).astype(np.float32)
    params = _random_params(rng)
    vec = colorgrade_params_vector(params)
    out = np.asarray(colorgrade_dynamic(img, True, vec))
    np.testing.assert_array_equal(out[..., 3], img[..., 3])


def test_grade_server_edit_roundtrip():
    """Edits re-grade the resident image: seq bumps, PNG changes, and
    graded_image matches the static chain for the edited params."""
    from yocto_tpu.apps.igrade import GradeServer

    rng = np.random.RandomState(5)
    img = rng.rand(16, 16, 3).astype(np.float32)
    srv = GradeServer(img, linear=True, title="test")
    seq0, png0 = srv.frame(-1, timeout=60.0)
    assert png0[:4] == b"\x89PNG"

    srv.command({"exposure": 1.25, "contrast": 0.7, "filmic": True})
    assert srv.params.exposure == 1.25 and srv.params.filmic is True
    seq1, png1 = srv.frame(seq0, timeout=60.0)
    assert seq1 != seq0 and png1 != png0

    want = ColorgradeParams(exposure=1.25, contrast=0.7, filmic=True)
    got = srv.graded_image()
    ref = np.asarray(colorgrade_dynamic(
        img, True, colorgrade_params_vector(want), filmic=True, srgb=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_tonemap_page_restricts_sliders():
    from yocto_tpu.apps.igrade import GradeServer

    img = np.zeros((4, 4, 3), np.float32)
    srv = GradeServer(img, linear=True, tonemap_only=True, title="t")
    page = srv.page()
    assert "exposure" in page and "filmic" in page
    assert "midtones" not in page
    full = GradeServer(img, linear=True, title="c").page()
    assert "midtones" in full
