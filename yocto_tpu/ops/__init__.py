"""Pure-function compute kernels: math, geometry, RNG, sampling, color,
noise, shading, texture eval, BVH build/traversal. Everything here is
batched jnp (vmappable, jittable) unless explicitly marked host-side."""
