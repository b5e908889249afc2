"""Interactive parametric editing demo: compile once, then sweep a
dimension and re-render with zero recompiles — the workflow GLSL-codegen
pipelines cannot offer (every edit is a new shader there; here edits are
operand updates to one executable).

`--view` opens the live viewer with a parametric SLIDER bound to the
boss radius: every slider move rebinds the parameter and re-renders
through the same raymarch executable (pipeline.InteractiveViewer
params=...). Headless hosts fall back to the scripted sweep below.
"""
import sys
import time

import numpy as np

from _common import example_args  # noqa: F401  (sets sys.path)

from gsdf_tpu import Builder
from gsdf_tpu.core.wrappers import with_bounds
from gsdf_tpu.geometry import box3
from gsdf_tpu.render.flat import FlatRenderer
from gsdf_tpu.render.stl import write_stl_file

if __name__ == "__main__":
    bld = Builder()
    hole = bld.new_cylinder(0.25, 4.0, 0.0)
    body = bld.smooth_union(
        0.1,
        bld.new_box(1.6, 1.0, 0.5, 0.05),
        bld.new_cylinder(0.45, 1.2, 0.05),
    )
    part = bld.difference(body, hole)
    # pin a render region covering every edit we intend to make
    pinned = with_bounds(part, box3(-1.2, -0.8, -0.9, 1.2, 0.8, 0.9))

    if "--view" in sys.argv:
        from gsdf_tpu.pipeline import InteractiveViewer

        boss = body.s2  # the boss cylinder node
        viewer = InteractiveViewer(
            pinned, width=512, height=512, verbose=True,
            params=[("boss r", boss, "r", 0.25, 0.6)],
        )
        try:
            viewer.show()
        except RuntimeError as e:
            print(f"[viewer] {e}; running the scripted sweep instead")
        else:
            sys.exit(0)

    fr = FlatRenderer(pinned, 0.02)
    t0 = time.monotonic()
    v, i = fr.render_compact(parametric=True)
    print(f"[{time.monotonic()-t0:.1f}s] first render (compile): {len(i)} triangles")

    cyl = body.s2  # the boss cylinder node
    for r in (0.35, 0.5, 0.6, 0.4):
        pinned.rebind({cyl: {"r": r}})  # supported parametric-edit API
        t0 = time.monotonic()
        v, i = fr.render_compact(parametric=True)
        print(
            f"[{(time.monotonic()-t0)*1e3:.0f}ms] boss radius {r}: "
            f"{len(i)} triangles"
        )
    write_stl_file("interactive-part.stl", v[i])
    print("wrote interactive-part.stl at the last edited state")
