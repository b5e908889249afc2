"""Project template for new parts (reference examples/template-makers).

Copy this file, edit `scene`, run:  python my_part.py --resdiv 300
"""
from _common import example_args, render_stl

from gsdf_tpu import Builder


def scene(bld: Builder):
    """Build your part here. Return a Shader3D."""
    body = bld.new_box(20, 20, 10, 1)
    hole = bld.new_cylinder(4, 30, 0)
    part = bld.difference(body, hole)
    err = bld.err()
    if err:
        raise err
    return part


if __name__ == "__main__":
    args = example_args(resdiv_default=200)
    bld = Builder()
    render_stl(scene(bld), "template-part", args)
