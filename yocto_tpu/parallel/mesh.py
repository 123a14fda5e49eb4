"""Tile-sharded distributed rendering.

The TPU replacement for the reference's scanline thread pool
(yocto_trace.cpp:55-78): the pixel batch is sharded over a 1-D device mesh
("tiles" axis = data parallelism over rays); the scene, lights, and BVH are
replicated. Because per-pixel PCG32 streams make every pixel independent,
tile sharding needs NO per-bounce communication — the only collectives are
`psum`-style reductions for observability (global sample means) and, later,
gradient reductions in the differentiable pass.

Multi-host scaling rides the same `Mesh`: `jax.distributed` initialization
adds hosts, the mesh spans all devices, and XLA routes the reductions over
ICI/DCN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.scene import SceneData
from ..ops import rng as R
from ..trace.params import TraceParams
from ..trace.renderer import TraceState, _one_sample, render_size
from ..trace.compile import compile_scene
from ..trace.lights import make_trace_lights


def make_tile_mesh(devices=None) -> Mesh:
    """1-D mesh over all devices; axis 'tiles' shards pixels/rays."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("tiles",))


class DistributedRenderer:
    """Renders with rows sharded across the mesh's 'tiles' axis.

    The accumulator arrays live sharded on the mesh; the scene is
    replicated. Each step is one jitted SPMD program; `gather_image`
    brings the tiles back to the host.
    """

    def __init__(self, scene: SceneData, params: TraceParams,
                 mesh: Mesh = None):
        self.mesh = mesh if mesh is not None else make_tile_mesh()
        self.params = params
        self.scene_host = scene
        self.flat = compile_scene(scene)
        self.lights, self.lights_meta = make_trace_lights(scene)
        if params.bruteforce:
            self.bvh = None
        else:
            from ..trace.bvh import build_scene_bvh
            self.bvh = build_scene_bvh(scene, params.highqualitybvh)
        self.width, self.height = render_size(scene, params)
        ndev = self.mesh.devices.size
        if self.height % ndev != 0:
            raise ValueError(
                f"height {self.height} must divide the mesh size {ndev}")

        meta = self.lights_meta
        width, height = self.width, self.height
        rows_per = height // ndev
        mesh = self.mesh

        state_spec = TraceState(
            image=P("tiles"), albedo=P("tiles"), normal=P("tiles"),
            hits=P("tiles"),
            rng=R.RngState(P("tiles"), P("tiles"), P("tiles"), P("tiles")),
            samples=P())
        replicated = jax.tree.map(lambda _: P(), self.flat)
        lights_rep = jax.tree.map(lambda _: P(), self.lights)

        bvh_rep = jax.tree.map(lambda _: P(), self.bvh) \
            if self.bvh is not None else None

        def shard_step(flat, lights, bvh, state):
            # Each shard renders its own row block. Pixel indices must be
            # globally correct so camera uvs match the single-chip render.
            tile = jax.lax.axis_index("tiles")
            return _one_sample(flat, lights, state, meta, params, width,
                               rows_per, row_offset=tile * rows_per,
                               full_height=height, bvh=bvh)

        if self.bvh is not None:
            self._step = jax.jit(shard_map(
                shard_step, mesh=mesh,
                in_specs=(replicated, lights_rep, bvh_rep, state_spec),
                out_specs=state_spec,
                check_rep=False))
        else:
            step_nobvh = lambda flat, lights, state: shard_step(
                flat, lights, None, state)
            self._step = jax.jit(shard_map(
                step_nobvh, mesh=mesh,
                in_specs=(replicated, lights_rep, state_spec),
                out_specs=state_spec,
                check_rep=False))

        self._ndev = ndev
        self._rows_per = rows_per

    def make_state(self) -> TraceState:
        from ..trace.renderer import make_trace_state
        state = make_trace_state(self.scene_host, self.params)
        shardings = jax.tree.map(
            lambda spec: NamedSharding(self.mesh, spec),
            TraceState(
                image=P("tiles"), albedo=P("tiles"), normal=P("tiles"),
                hits=P("tiles"),
                rng=R.RngState(P("tiles"), P("tiles"), P("tiles"),
                               P("tiles")),
                samples=P()))
        # rng leaves are flat [H*W] row-major, so sharding the first axis
        # splits them into exactly the same row blocks as the images
        return jax.tree.map(jax.device_put, state, shardings)

    def sample(self, state: TraceState) -> TraceState:
        if self.bvh is not None:
            return self._step(self.flat, self.lights, self.bvh, state)
        return self._step(self.flat, self.lights, state)

    def render(self, nsamples=None) -> TraceState:
        state = self.make_state()
        n = self.params.samples if nsamples is None else nsamples
        for _ in range(n):
            state = self.sample(state)
        return state

    def gather_image(self, state: TraceState) -> np.ndarray:
        return np.asarray(jax.device_get(state.image))
