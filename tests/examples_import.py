"""Shared scene builders used across tests (importable example parts)."""
from gsdf_tpu import Builder
from gsdf_tpu.forge import threads


def flange_scene():
    """The npt-flange benchmark part (examples/npt_flange.py)."""
    bld = Builder()
    tlen = 18.0 / 25.4
    internal_diameter = 1.5 / 2.0
    flange_h = 7.0 / 25.4
    flange_d = 60.0 / 25.4
    npt = threads.NPT()
    npt.set_from_nominal(1.0 / 2.0)
    pipe = threads.nut(bld, threads.NutParams(thread=npt, style=threads.NutStyle.CIRCULAR))
    flange = bld.new_cylinder(flange_d / 2, flange_h, flange_h / 8)
    flange = bld.translate(flange, 0, 0, -tlen / 2)
    union = bld.smooth_union(0.2, pipe, flange)
    hole = bld.new_cylinder(internal_diameter / 2, 4 * flange_h, 0)
    union = bld.difference(union, hole)
    return bld.scale(union, 25.4)
