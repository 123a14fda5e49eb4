"""Reference-corpus parity: render the reference's own test scenes and
compare against freshly-generated reference goldens.

Goldens in tests/goldens/corpus/ were rendered with the reference binary
built from /root/reference (cmake Release, EMBREE/DENOISE/CUDA off) at
320 res, 64 spp, 8 bounces, default seed:

    ytrace --scene tests/<s>/<s>.json --output <s>-320-64.hdr \
           --resolution 320 --samples 64 --bounces 8

(The repo's shipped tests/_renderings/*-dev.hdr files are STALE relative
to the current scene corpus — the reference binary itself renders
features1 ~1.35x brighter than its shipped golden — so fresh goldens are
the correct target.)

At 64 spp with independent RNG streams the expected per-pixel residual is
Monte-Carlo noise; the reference's own seed-to-seed noise floor measured
on features1 is mean|d| = 0.0587 with 20% of pixels above 25% relative.
The thresholds below are ~1.3x that floor: they fail on systematic bias,
not on noise.

These renders take minutes per scene on the 1-core CPU backend, so the
suite runs them only when RUN_SLOW_TESTS=1 (the TPU driver exercises them
through bench/corpus scripts).
"""

import os

import numpy as np
import pytest

from yocto_tpu.io.imageio import load_image
from yocto_tpu.io.sceneio import load_scene
from yocto_tpu.models.tesselate import tesselate_subdivs
from yocto_tpu.trace.params import SamplerType, TraceParams

CORPUS = os.path.join(os.path.dirname(__file__), "goldens", "corpus")
REF_TESTS = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="corpus renders take minutes on the 1-core CPU backend; "
           "set RUN_SLOW_TESTS=1 (they run on TPU via bench/corpus jobs)")


def _scene_dir(name, tmp_path):
    """The reference checkout ships features2/shapes2 WITHOUT their
    generated assets (hairball.ply, displacedsubdiv.ply/.obj). Their
    goldens were rendered by the reference binary from a copy completed
    with our deterministic preset generators; tests rebuild the same
    copy. Other scenes load straight from the reference tree."""
    src = os.path.join(REF_TESTS, name)
    if name not in ("features2", "shapes2"):
        return src
    import shutil
    from yocto_tpu.io.obj import save_shape_obj
    from yocto_tpu.io.ply import save_shape_ply
    from yocto_tpu.io.presets import make_shape_preset

    dst = os.path.join(tmp_path, name)
    shutil.copytree(src, dst)
    quady = make_shape_preset("test-quady-displaced")
    save_shape_ply(os.path.join(dst, "shapes", "displacedsubdiv.ply"),
                   quady)
    save_shape_obj(os.path.join(dst, "subdivs", "displacedsubdiv.obj"),
                   quady)
    if name == "features2":
        save_shape_ply(os.path.join(dst, "shapes", "hairball.ply"),
                       make_shape_preset("test-hairball2"))
    return dst


@pytest.mark.parametrize("name,mean_tol,frac_tol", [
    ("features1", 0.08, 0.27),
    ("features2", 0.10, 0.30),    # hair: thin-geometry variance
    ("materials1", 0.08, 0.27),
    ("materials2", 0.10, 0.30),   # rough metals: higher-variance speculars
    ("materials4", 0.08, 0.27),
    ("shapes1", 0.08, 0.27),
    ("shapes2", 0.08, 0.27),
])
def test_corpus_scene(name, mean_tol, frac_tol, tmp_path):
    golden, _ = load_image(os.path.join(CORPUS, f"{name}-320-64.hdr"))
    golden = golden[..., :3]
    sdir = _scene_dir(name, str(tmp_path))
    scene = load_scene(os.path.join(sdir, f"{name}.json"))
    tesselate_subdivs(scene)
    params = TraceParams(resolution=320, samples=64, bounces=8,
                         sampler=SamplerType.path, spp_batch=4)
    from yocto_tpu.trace.wavefront import WavefrontRenderer
    r = WavefrontRenderer(scene, params)
    img = np.asarray(r.render().image)[..., :3]
    assert img.shape == golden.shape
    d = np.abs(img - golden)
    rel = d / (np.abs(golden) + 0.05)
    assert d.mean() < mean_tol, f"mean diff {d.mean()}"
    assert (rel.max(-1) > 0.25).mean() < frac_tol
