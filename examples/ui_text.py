"""Extruded 3D text (reference examples/ui-text/uitext.go:20-43).

The reference shows this in an interactive raymarch UI; here it renders to
STL.
"""
from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.forge.textsdf import Font, FontConfig


def scene(bld: Builder):
    f = Font()
    f.configure(FontConfig(relative_glyph_tolerance=0.15, builder=bld))
    f.load_default()
    text = "Hello world!"
    line = f.text_line(text)
    line = bld.scale2d(line, 10)  # scale to prevent numeric error

    sz = line.bounds().size()
    char_width = float(sz[0]) / len(text)
    line = bld.translate2d(line, -float(sz[0]) / 2, 0)
    shape = bld.extrude(line, char_width / 3)
    shape = bld.scale(shape, 0.3)
    err = bld.err()
    if err:
        raise err
    return shape


if __name__ == "__main__":
    import sys

    use_dc = "--dc" in sys.argv
    if use_dc:
        sys.argv.remove("--dc")
    args = example_args(resdiv_default=400)
    bld = Builder()
    obj = scene(bld)
    if use_dc:
        # dual-contouring vertex placement (BASELINE config:
        # "ui-text at resdiv 800, dual-contouring vertex placement")
        import time

        from gsdf_tpu.render import DualContourLeastSquares, DualContourRenderer
        from gsdf_tpu.render.stl import write_stl_file

        import jax

        device = jax.devices("cpu")[0] if args.cpu else None
        res = args.res or obj.bounds().diagonal() / args.resdiv
        dc = DualContourRenderer(
            obj, res, DualContourLeastSquares(chiseled=True), device=device
        )
        t0 = time.monotonic()
        tris = dc.render()
        dt = time.monotonic() - t0
        write_stl_file("uitext-dc.stl", tris)
        print(
            f"finished uitext (dual contour): {len(tris)} triangles in "
            f"{dt:.1f}s ({dc.evaluations()} evals) -> uitext-dc.stl"
        )
    else:
        render_stl(obj, "uitext", args)
