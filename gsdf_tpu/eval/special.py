"""Specialized whole-kernel 2D evaluators (reference gleval/gpu.go:169-446:
PolygonGPU, Lines2DGPU, DisplaceMulti2D).

In the reference these hand-written compute shaders bypass tree codegen to
benchmark raw GPU throughput. On TPU every node already compiles to a fused
kernel, so these are thin constructors over the corresponding nodes —
retained for API parity and as microbenchmark entry points.
"""
from __future__ import annotations

import numpy as np

from ..core.primitives2 import Lines2D, Polygon2D
from ..core.ops2 import TranslateMulti2D
from .evaluator import SDF2, new_sdf2

_f32 = np.float32


def polygon_gpu(vertices, device=None) -> SDF2:
    """Winding-number polygon evaluator (reference PolygonGPU, gpu.go:169)."""
    return new_sdf2(Polygon2D(np.asarray(vertices, _f32)), device)


def lines2d_gpu(segments, width, device=None) -> SDF2:
    """Batched thick-segment evaluator (reference Lines2DGPU, gpu.go:256)."""
    return new_sdf2(Lines2D(np.asarray(segments, _f32), width), device)


def displace_multi2d(shape2d, displacements, device=None) -> SDF2:
    """Multi-displacement min-union evaluator
    (reference DisplaceMulti2D, gpu.go:355)."""
    return new_sdf2(TranslateMulti2D(shape2d, displacements), device)
