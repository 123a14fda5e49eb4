"""Data models: scene, shapes, images — host-side containers (NumPy) plus
their batched jnp evaluation functions and the flat SoA device compilation
used by the tracer."""
