"""Knurled cylinder with twisted diamond pattern and vent holes
(reference examples/knurled-cylinder/knurled-cyl.go:57-110; a port of
fogleman's sdf python knurling example).
"""
import math

from _common import example_args, render_stl

from gsdf_tpu import Builder


def build_shape(bld: Builder, diameter=20.0, hole_diam=0.0, length=0.0, knurl_size=0.0):
    r = diameter / 2
    length = length or 5 * r
    hole_diam = hole_diam or r
    knurl_side = knurl_size or r

    smooth_ratio = 0.1
    twist_k = 0.75
    knurl_offset_r = 1.6
    knurl_n = 24

    sk = smooth_ratio * r

    obj = bld.new_cylinder(r, length, smooth_ratio * r)

    knurl_box = bld.new_box(knurl_side, knurl_side, length * 0.8, 0)
    knurl_box = bld.rotate(knurl_box, math.pi / 4, (0, 0, 1))
    knurl_box = bld.translate(knurl_box, knurl_offset_r * r, 0, 0)
    knurl_box = bld.circular_array(knurl_box, knurl_n, knurl_n)
    knurl = bld.union(
        bld.twist(knurl_box, twist_k / r),
        bld.twist(knurl_box, -twist_k / r),
    )
    obj = bld.smooth_difference(sk, obj, knurl)

    obj = bld.smooth_difference(sk, obj, bld.new_cylinder(hole_diam / 2, length + 2 * r, 0))

    vent = bld.new_cylinder(0.25 * r, 3 * r, 0)
    vent = bld.rotate(vent, math.pi / 2, (0, 1, 0))
    obj = bld.smooth_difference(sk, obj, bld.translate(vent, 0, 0, -length / 2))
    obj = bld.smooth_difference(sk, obj, bld.translate(vent, 0, 0, length / 2))

    err = bld.err()
    if err:
        raise err
    return obj


if __name__ == "__main__":
    args = example_args(d=(20.0, "diameter of cylinder"))
    bld = Builder()
    render_stl(build_shape(bld, diameter=args.d), "knurled-cyl", args)
