"""GLSL export + shadertoy visualization (glbuild parity as a visualization
feature; compute runs on XLA)."""
from .glsl import emit_functions, node_name, write_sdf_decl
from .shadertoy import write_shadertoy_visual

__all__ = ["emit_functions", "node_name", "write_sdf_decl", "write_shadertoy_visual"]
