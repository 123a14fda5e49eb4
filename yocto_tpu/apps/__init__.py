"""Command-line tools: the reference's app layer (apps/*.cpp equivalents)
driving the TPU renderer. Run as `python -m yocto_tpu.apps.<tool>`."""

# All apps compile big jit graphs; the persistent compilation cache is
# what makes repeat CLI invocations fast (the env var alone does not
# activate it on this backend — see yocto_tpu.enable_compilation_cache).
from .. import enable_compilation_cache as _ecc

_ecc()
del _ecc
