"""glTF 2.0 scene IO (own minimal parser over JSON + BIN buffers; the
reference uses cgltf, yocto_sceneio.cpp:31). Implemented in round 1 as a
loader for the common mesh/material subset; extended in later rounds."""

from __future__ import annotations


def load_gltf_scene(path: str):
    raise NotImplementedError("glTF loading lands in a later milestone")


def save_gltf_scene(path: str, scene) -> None:
    raise NotImplementedError("glTF saving lands in a later milestone")
