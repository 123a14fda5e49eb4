"""PBRT v3 subset scene IO (the reference's yocto_pbrtio equivalent).
Implemented in a later milestone of this round."""

from __future__ import annotations


def load_pbrt_scene(path: str):
    raise NotImplementedError("pbrt loading lands in a later milestone")


def save_pbrt_scene(path: str, scene) -> None:
    raise NotImplementedError("pbrt saving lands in a later milestone")
