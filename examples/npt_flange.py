"""NPT flange: threaded pipe fitting with base plate — the reference's README
benchmark part (reference examples/npt-flange/flange.go:23-58).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gsdf_tpu import Builder
from gsdf_tpu.forge import threads
from gsdf_tpu.pipeline import RenderConfig, render_shader3d


def scene(bld: Builder):
    tlen = 18.0 / 25.4
    internal_diameter = 1.5 / 2.0
    flange_h = 7.0 / 25.4
    flange_d = 60.0 / 25.4

    npt = threads.NPT()
    npt.set_from_nominal(1.0 / 2.0)

    pipe = threads.nut(bld, threads.NutParams(thread=npt, style=threads.NutStyle.CIRCULAR))

    # Base plate which goes bolted to joint.
    flange = bld.new_cylinder(flange_d / 2, flange_h, flange_h / 8)
    # Join threaded section with flange.
    flange = bld.translate(flange, 0, 0, -tlen / 2)
    union = bld.smooth_union(0.2, pipe, flange)
    # Make through-hole in flange bottom.
    hole = bld.new_cylinder(internal_diameter / 2, 4 * flange_h, 0)
    union = bld.difference(union, hole)
    # Convert from imperial inches to millimeters.
    union = bld.scale(union, 25.4)
    err = bld.err()
    if err:
        raise err
    return union


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=float, default=0.0, help="resolution in shape units")
    ap.add_argument("--resdiv", type=int, default=200, help="bounding-diagonal divisions")
    ap.add_argument("--cpu", action="store_true", help="render on host CPU instead of accelerator")
    ap.add_argument("--out", default="nptflange.stl")
    args = ap.parse_args()

    bld = Builder()
    obj = scene(bld)
    res = args.res or obj.bounds().diagonal() / args.resdiv
    with open(args.out, "wb") as f, open("nptflange.glsl", "w") as fvis:
        stats = render_shader3d(
            obj,
            RenderConfig(
                stl_output=f,
                visual_output=fvis,
                resolution=res,
                use_gpu=not args.cpu,
            ),
        )
    print(f"finished npt-flange example: {stats['triangles']} triangles -> {args.out}")


if __name__ == "__main__":
    main()
