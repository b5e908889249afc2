"""Multi-chip scale-out: mesh construction + sharded render pipeline."""
from .sharded import (
    AXIS,
    make_mesh,
    render_sharded,
    render_sharded_compact,
    sharded_grid_eval,
    sharded_render_step,
)

__all__ = [
    "AXIS",
    "make_mesh",
    "render_sharded",
    "render_sharded_compact",
    "sharded_grid_eval",
    "sharded_render_step",
]
