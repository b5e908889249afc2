"""Showerhead with plastic buttress thread, knurled grip and 130
fibonacci-spaced holes (reference examples/fibonacci-showerhead/main.go:30-88).
"""
import math

import numpy as np

from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.forge import threads
from gsdf_tpu.pipeline import render_png_file_2d


def fibonacci(n: int):
    angle_of_divergence = 137.3
    spacing = 2.6
    a = n * angle_of_divergence / 360 * math.pi
    r = spacing * math.sqrt(n)
    return r * math.cos(a), r * math.sin(a)


def scene(bld: Builder, thread_png=None):
    thread_ext_diameter = 65.0
    threaded_length = 5.0
    thread_turns = 3.0
    thread_pitch = threaded_length / thread_turns

    showerhead_base_thick = 2.5
    showerhead_wall = 4.0
    thread_height = 5.0

    shower_thread = threads.PlasticButtress(d=thread_ext_diameter, p=thread_pitch)
    if thread_png:
        t2d = shower_thread.thread(bld)
        render_png_file_2d(thread_png, t2d, 512, 512)

    knurled = threads.knurled_head(
        bld, thread_ext_diameter / 2 + showerhead_wall, thread_height, 1
    )
    screw = threads.screw(bld, thread_height + 0.5, shower_thread)
    obj = bld.difference(knurled, screw)

    base = bld.new_cylinder(
        thread_ext_diameter / 2 + showerhead_wall, showerhead_base_thick, 0
    )
    base = bld.translate(
        base, 0, 0, -(threaded_length / 2 + showerhead_base_thick / 2 - 1)
    )

    hole = bld.new_cylinder(0.8, showerhead_base_thick * 10, 0)
    holes = hole
    for i in range(130):
        x, y = fibonacci(i)
        holes = bld.union(holes, bld.translate(hole, x, y, 0))
    base = bld.difference(base, holes)

    obj = bld.union(obj, base)
    err = bld.err()
    if err:
        raise err
    return obj


if __name__ == "__main__":
    args = example_args()
    bld = Builder()
    render_stl(scene(bld, thread_png="thread.png"), "showerhead", args)
