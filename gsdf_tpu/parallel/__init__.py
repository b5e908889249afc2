"""Multi-chip scale-out: mesh construction + sharded render pipeline."""
from .sharded import (
    AXIS,
    make_mesh,
    render_sharded,
    render_sharded_compact,
    sharded_grid_eval,
    sharded_render_step,
)
from .sharded_dc import render_dc_sharded, sharded_dc_step

__all__ = [
    "AXIS",
    "make_mesh",
    "render_dc_sharded",
    "render_sharded",
    "render_sharded_compact",
    "sharded_dc_step",
    "sharded_grid_eval",
    "sharded_render_step",
]
