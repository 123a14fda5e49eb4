"""ytrace: offline path tracing (apps/ytrace.cpp equivalent).

Same flags as the reference CLI; renders on the available JAX device
(TPU when present). Interactive mode renders progressively and writes
preview files rather than opening a GL window (the GUI layer maps to
host-side viewers in this framework)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..io.imageio import is_hdr_filename, save_image
from ..io.sceneio import (add_sky, load_scene, load_trace_params,
                          save_trace_params)
from ..models.scene import find_camera
from ..trace.params import (FALSECOLOR_NAMES, SAMPLER_NAMES, FalsecolorType,
                            SamplerType, TraceParams)
from ..utils.cli import SimpleTimer, exit_error, print_info


def build_parser():
    cli = argparse.ArgumentParser("ytrace",
                                  description="render with raytracing")
    cli.add_argument("--scene", default="scene.json", help="scene filename")
    cli.add_argument("--output", default="out.png", help="output filename")
    cli.add_argument("--params", default="", help="params filename")
    cli.add_argument("--interactive", action="store_true",
                     help="run interactively")
    cli.add_argument("--camera", default="", help="camera name")
    cli.add_argument("--addsky", action="store_true", help="add sky")
    cli.add_argument("--envname", default="", help="add environment")
    cli.add_argument("--savebatch", action="store_true", help="save batch")
    defaults = TraceParams()
    cli.add_argument("--resolution", type=int, default=defaults.resolution)
    cli.add_argument("--sampler", choices=SAMPLER_NAMES, default="path")
    cli.add_argument("--falsecolor", choices=FALSECOLOR_NAMES,
                     default="color")
    cli.add_argument("--samples", type=int, default=defaults.samples)
    cli.add_argument("--bounces", type=int, default=defaults.bounces)
    cli.add_argument("--denoise", action="store_true")
    cli.add_argument("--batch", type=int, default=defaults.batch)
    cli.add_argument("--clamp", type=float, default=defaults.clamp)
    cli.add_argument("--nocaustics", action="store_true")
    cli.add_argument("--envhidden", action="store_true")
    cli.add_argument("--tentfilter", action="store_true")
    cli.add_argument("--embreebvh", action="store_true",
                     help="accepted for compatibility")
    cli.add_argument("--highqualitybvh", action="store_true")
    cli.add_argument("--noparallel", action="store_true")
    cli.add_argument("--dumpparams", default="")
    cli.add_argument("--bruteforce", action="store_true",
                     help="skip the BVH (debug)")
    cli.add_argument("--wavefront", choices=["auto", "on", "off"],
                     default="auto",
                     help="compacted wavefront pipeline (auto: on for "
                          "path-sampler scenes above 4096 elements)")
    cli.add_argument("--sppbatch", type=int, default=0,
                     help="samples per device step (wavefront; 0 = auto)")
    return cli


def main(argv=None):
    args = build_parser().parse_args(argv)
    params = TraceParams(
        resolution=args.resolution,
        sampler=SamplerType(SAMPLER_NAMES.index(args.sampler)),
        falsecolor=FalsecolorType(FALSECOLOR_NAMES.index(args.falsecolor)),
        samples=args.samples, bounces=args.bounces, denoise=args.denoise,
        batch=args.batch, clamp=args.clamp, nocaustics=args.nocaustics,
        envhidden=args.envhidden, tentfilter=args.tentfilter,
        embreebvh=args.embreebvh, highqualitybvh=args.highqualitybvh,
        noparallel=args.noparallel, bruteforce=args.bruteforce)
    if args.params:
        params = load_trace_params(args.params)
        print_info(f"loading params {args.params}")
    if args.dumpparams:
        save_trace_params(args.dumpparams, params)
        print_info(f"saving params {args.dumpparams}")

    print_info(f"rendering {args.scene}")
    with SimpleTimer("load scene"):
        scene = load_scene(args.scene)

    if args.addsky:
        add_sky(scene)
    if args.envname:
        from ..io.sceneio import load_texture
        from ..models.scene import EnvironmentData
        tex = load_texture(args.envname)
        scene.textures.append(tex)
        scene.texture_names.append("environment")
        scene.environments.append(EnvironmentData(
            emission=np.ones(3, np.float32),
            emission_tex=len(scene.textures) - 1))
        scene.environment_names.append("environment")

    if args.camera:
        params.camera = find_camera(scene, args.camera)

    with SimpleTimer("tesselate subdivs"):
        from ..models.tesselate import tesselate_subdivs
        tesselate_subdivs(scene)

    from ..trace.renderer import Renderer, get_image

    if args.interactive:
        # the reference's cancel -> preview -> progressive-batches loop
        # (apps/ytrace.cpp:161-265) with the GL window replaced by file
        # output: writes an immediate low-res preview, then refreshes the
        # output image as sample batches land (see trace.progressive)
        import time as _time

        from ..trace.progressive import (get_current_image,
                                         make_trace_context, trace_done,
                                         trace_preview, trace_start)
        with SimpleTimer("trace preview"):
            save_image(args.output, trace_preview(scene, params),
                       linear=True)
        ctx = make_trace_context(scene, params)
        trace_start(ctx)
        last = 0
        while not trace_done(ctx):
            _time.sleep(0.5)
            done = int(ctx.state.samples)
            if done > last:
                print_info(f"samples {done}/{params.samples}")
                save_image(args.output, get_current_image(ctx),
                           linear=True)
                last = done
        save_image(args.output, get_current_image(ctx), linear=True)
        print_info(f"saved {args.output}")
        return 0

    n_cands = sum(
        max(len(scene.shapes[i.shape].points),
            len(scene.shapes[i.shape].lines),
            len(scene.shapes[i.shape].triangles),
            len(scene.shapes[i.shape].quads))
        for i in scene.instances if 0 <= i.shape < len(scene.shapes))
    from ..trace.params import SamplerType as _ST
    wf_auto = (params.sampler in (_ST.path, _ST.pathtest, _ST.pathmis,
                                  _ST.pathdirect)
               and n_cands > 4096)
    use_wavefront = (args.wavefront == "on"
                     or (args.wavefront == "auto" and wf_auto))
    with SimpleTimer("build renderer"):
        if use_wavefront:
            import dataclasses
            from ..trace.wavefront import (WavefrontPathdirectRenderer,
                                           WavefrontPathmisRenderer,
                                           WavefrontRenderer)
            spp = args.sppbatch or max(params.batch, 4)
            cls = {_ST.pathmis: WavefrontPathmisRenderer,
                   _ST.pathdirect: WavefrontPathdirectRenderer}.get(
                       params.sampler, WavefrontRenderer)
            try:
                renderer = cls(
                    scene, dataclasses.replace(params, spp_batch=spp))
            except ValueError:
                renderer = Renderer(scene, params)  # volume fallbacks etc.
        else:
            renderer = Renderer(scene, params)
    state = renderer.make_state()
    while int(state.samples) < params.samples:
        done = int(state.samples)
        with SimpleTimer(
                f"render sample {done}/{params.samples}"):
            target = min(done + max(params.batch, 1), params.samples)
            while int(state.samples) < target:
                state = renderer.sample(state)
        if args.savebatch:
            base, ext = os.path.splitext(args.output)
            batchname = f"{base}-s{int(state.samples)}{ext}"
            save_image(batchname, get_image(state), linear=True)
    image = get_image(state)
    if params.denoise:
        from ..trace.denoise import denoise_state
        with SimpleTimer("denoise image"):
            image = denoise_state(state)
    with SimpleTimer("save image"):
        save_image(args.output, image, linear=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
