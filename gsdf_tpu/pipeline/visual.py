"""Pipeline hook for shadertoy visual output."""
from ..visual.shadertoy import write_shadertoy_visual

__all__ = ["write_shadertoy_visual"]
