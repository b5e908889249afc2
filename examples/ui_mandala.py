"""Mandala: 2D circular array of annular shapes, extruded and rounded
(reference examples/ui-mandala/mandala.go:12-31). The reference shows this
in an interactive raymarch UI; here it renders to STL + PNG and exports the
shadertoy visualization.
"""
from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.pipeline import render_png_file_2d


def scene2d(bld: Builder):
    circle = bld.new_circle(1)
    hexagon = bld.new_hexagon(1)
    circle = bld.translate2d(circle, 1, 1)
    shape = bld.union2d(circle, hexagon)
    shape = bld.offset2d(shape, 0.2)
    shape = bld.annulus(shape, 0.3)
    shape = bld.translate2d(shape, 3, 0)
    shape = bld.circular_array2d(shape, 12, 12)
    return shape


def scene(bld: Builder):
    mandala = scene2d(bld)
    shape = bld.extrude(mandala, 1)
    shape = bld.offset(shape, -0.1)
    shape = bld.scale(shape, 0.3)
    err = bld.err()
    if err:
        raise err
    return shape


if __name__ == "__main__":
    import sys

    bld = Builder()
    if "--interactive" in sys.argv:
        # live orbit/zoom raymarch viewer (reference gsdfaux.UI);
        # headless hosts fall back to a turntable GIF automatically
        from gsdf_tpu.pipeline import interactive_view

        interactive_view(scene(bld), width=640, height=640)
    else:
        args = example_args()
        render_png_file_2d("mandala2D.png", scene2d(bld), 768, 768)
        render_stl(scene(bld), "mandala", args)
