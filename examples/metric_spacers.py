"""Batch of metric spacers: hexagon minus circle, extruded
(reference examples/metric-spacers/metric-spacers.go:23-35).
"""
import re
import sys

from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.pipeline import render_png_file_2d


def build_spacer(bld: Builder, hole_diameter: float, length: float, png=None):
    hexagon = bld.new_hexagon(hole_diameter * 1.15)
    if png:
        render_png_file_2d(png, hexagon, 1000, 1000)
    hex2 = bld.difference2d(hexagon, bld.new_circle(hole_diameter / 2))
    obj = bld.extrude(hex2, length)
    err = bld.err()
    if err:
        raise err
    return obj


if __name__ == "__main__":
    args = example_args(
        spacers=("M3x5", "spacers with format M<d>x<L>[,M<d>x<L>...]"),
        dscale=(1.0, "scale diameter of spacers"),
    )
    bld = Builder()
    for spec in args.spacers.split(","):
        m = re.fullmatch(r"M([\d.]+)x([\d.]+)", spec.strip())
        if not m:
            sys.exit(f"bad spacer spec {spec!r}")
        d, L = float(m.group(1)) * args.dscale, float(m.group(2))
        obj = build_spacer(bld, d, L, png=f"M{d:g}x{L:g}.png")
        args.out = f"spacer_M{d:g}x{L:g}.stl"
        render_stl(obj, f"M{d:g}x{L:g}", args)
