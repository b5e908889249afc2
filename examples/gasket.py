"""Tupperware lid gasket: polygon with arcs, symmetry, offset, extrude
(reference examples/gasket/main.go:30-84).
"""
from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.geometry.polygon import PolygonBuilder
from gsdf_tpu.pipeline import render_png_file_2d


def scene(bld: Builder, png=None):
    tupper_w = 96.0
    tupper_l = 156.0
    tupper_l_start_round = 154.0
    channel_w = 4.15
    round_ = 10.0
    ext_round = round_ + 1.2 * channel_w
    tupper_l_arc_radius = tupper_l * 2.4
    ext_tupper_l_arc_radius = tupper_l_arc_radius + channel_w

    gasket_height = 1.0
    tol = 0.8
    eps = 1 + tol

    poly = PolygonBuilder()
    poly.add_xy(tupper_l / 2, -eps)
    poly.add_xy(tupper_l_start_round / 2, tupper_w / 2 - round_).arc(tupper_l_arc_radius, 5)
    poly.add_xy(tupper_l_start_round / 2 - round_, tupper_w / 2).arc(round_, 6)
    poly.add_xy(-eps, tupper_w / 2)
    poly.add_xy(-eps, tupper_w / 2 + channel_w)
    poly.add_xy(tupper_l_start_round / 2 - round_, tupper_w / 2 + channel_w)
    poly.add_xy(tupper_l_start_round / 2 + channel_w, tupper_w / 2 - 2 * channel_w).arc(-ext_round, 6)
    poly.add_xy(tupper_l / 2 + channel_w, -eps).arc(-ext_tupper_l_arc_radius, 5)

    poly2 = bld.new_polygon(poly.vertices())
    poly2 = bld.symmetry2d(poly2, True, True)
    poly2 = bld.offset2d(poly2, tol)
    if png:
        render_png_file_2d(png, poly2, 500, 500)
    obj = bld.extrude(poly2, gasket_height)
    err = bld.err()
    if err:
        raise err
    return obj


if __name__ == "__main__":
    args = example_args(resdiv_default=350)
    bld = Builder()
    render_stl(scene(bld, png="gasket2D.png"), "gasket", args)
