"""Evaluation backends (jit point-batch + grid evaluators, normals, caches)."""
from .evaluator import (
    SDF2,
    SDF3,
    BlockCachedSDF3,
    clear_jit_cache,
    evaluate_grid,
    new_cpu_sdf3,
    new_sdf2,
    new_sdf3,
    normals_central_diff,
)

__all__ = [
    "SDF2",
    "SDF3",
    "BlockCachedSDF3",
    "clear_jit_cache",
    "evaluate_grid",
    "new_cpu_sdf3",
    "new_sdf2",
    "new_sdf3",
    "normals_central_diff",
]
