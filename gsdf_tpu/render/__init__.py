"""Renderers and mesh output."""
from .flat import FlatRenderer, render_flat
from .stl import read_binary_stl, write_binary_stl, write_stl_file

__all__ = [
    "FlatRenderer",
    "render_flat",
    "read_binary_stl",
    "write_binary_stl",
    "write_stl_file",
]
