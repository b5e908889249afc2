"""Plant pot base: polygon profile revolved about the axis
(reference examples/plantpot/main.go:33-64).
"""
import math

from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.geometry.polygon import PolygonBuilder
from gsdf_tpu.pipeline import render_png_file_2d

POT_BASE_RADIUS = 40.0


def scene_pot_base(bld: Builder, png=None):
    base_height = 10.0
    base_inclination = 45.0 * math.pi / 180
    base_wall_thick = 5.0
    base_lip_radius = base_wall_thick * 0.54

    x_off = base_height * math.sin(base_inclination)
    poly = PolygonBuilder()
    poly.add_xy(0, 0)
    poly.add_xy(POT_BASE_RADIUS, 0)
    poly.add_xy(POT_BASE_RADIUS + x_off, base_height)
    poly.add_relative_xy(base_wall_thick / 3, -base_wall_thick).arc(-base_lip_radius, 20)
    poly.add_xy(POT_BASE_RADIUS + base_wall_thick / 2, -base_wall_thick)
    poly.add_xy(0, -base_wall_thick)

    poly2 = bld.new_polygon(poly.vertices())
    if png:
        render_png_file_2d(png, poly2, 1080, 1080)
    obj = bld.revolve(poly2, 0)
    err = bld.err()
    if err:
        raise err
    return obj


if __name__ == "__main__":
    args = example_args()
    bld = Builder()
    render_stl(scene_pot_base(bld, png="plantpot2D.png"), "plantpot", args)
