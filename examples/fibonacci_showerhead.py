"""Showerhead with plastic buttress thread, knurled grip and 130
fibonacci-spaced holes (reference examples/fibonacci-showerhead/main.go:30-88).
Scene lives in gsdf_tpu.flagships; this is the CLI wrapper.
"""
from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.flagships import fibonacci  # noqa: F401  (re-export)
from gsdf_tpu.flagships import showerhead_scene


def scene(bld: Builder, thread_png=None):
    obj = showerhead_scene(bld, thread_png=thread_png)
    err = bld.err()
    if err:
        raise err
    return obj


if __name__ == "__main__":
    args = example_args()
    bld = Builder()
    render_stl(scene(bld, thread_png="thread.png"), "showerhead", args)
