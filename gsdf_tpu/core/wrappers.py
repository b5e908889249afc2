"""Node wrappers (reference glbuild.go:1080-1232).

- `with_bounds` overrides a shape's bounding box (reference
  OverloadShader3DBounds / OverloadShader2DBounds): used to tighten
  conservative bounds or to clip the rendered region.
- The reference's CachedShader3D/2D memoize generated GLSL text; the jit
  compile cache keyed on tree hashes subsumes that here, so no distance
  caching wrapper is needed.
"""
from __future__ import annotations

from ..geometry.boxes import Box
from .node import Shader2D, Shader3D


class BoundsOverride3(Shader3D):
    PARAMS = ("bb_min", "bb_max")
    CHILDREN = ("s",)

    def __init__(self, s: Shader3D, bb: Box):
        self.s = s
        self.bb = bb
        self.bb_min = bb.min
        self.bb_max = bb.max

    def distance(self, p):
        return self.s.distance(p)

    def bounds(self) -> Box:
        return self.bb


class BoundsOverride2(Shader2D):
    PARAMS = ("bb_min", "bb_max")
    CHILDREN = ("s",)

    def __init__(self, s: Shader2D, bb: Box):
        self.s = s
        self.bb = bb
        self.bb_min = bb.min
        self.bb_max = bb.max

    def distance(self, p):
        return self.s.distance(p)

    def bounds(self) -> Box:
        return self.bb


def with_bounds(s, bb: Box):
    """Return s with its bounding box replaced by bb."""
    if isinstance(s, Shader3D):
        return BoundsOverride3(s, bb)
    if isinstance(s, Shader2D):
        return BoundsOverride2(s, bb)
    raise TypeError(f"expected a shader, got {type(s)}")
