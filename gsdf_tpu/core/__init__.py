"""Core SDF tree: Builder, node types, primitives and operations."""
from .builder import BuilderCore, Flags, ShapeError
from .node import Shader, Shader2D, Shader3D
from .ops2 import BuilderOps2
from .ops3 import BuilderOps3
from .primitives2 import BuilderPrimitives2
from .primitives3 import BuilderPrimitives3


class Builder(
    BuilderCore, BuilderPrimitives3, BuilderPrimitives2, BuilderOps3, BuilderOps2
):
    """Shape factory: all primitive and operation constructors in one place.

    API parity with the reference Builder (gsdf.go:44): same validation rules
    and panic/accumulate error policy, snake_case method names.
    """


__all__ = [
    "Builder",
    "Flags",
    "ShapeError",
    "Shader",
    "Shader2D",
    "Shader3D",
]
