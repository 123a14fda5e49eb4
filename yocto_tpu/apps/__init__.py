"""Command-line tools: the reference's app layer (apps/*.cpp equivalents)
driving the TPU renderer. Run as `python -m yocto_tpu.apps.<tool>`."""
