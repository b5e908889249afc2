"""NPT flange: threaded pipe fitting with base plate — the reference's README
benchmark part (reference examples/npt-flange/flange.go:23-58). Scene lives
in gsdf_tpu.flagships; this is the CLI wrapper.
"""
import argparse

from _common import example_args  # noqa: F401  (ensures gsdf_tpu importable)

from gsdf_tpu import Builder
from gsdf_tpu.flagships import flange_scene
from gsdf_tpu.pipeline import RenderConfig, render_shader3d


def scene(bld: Builder):
    union = flange_scene(bld)
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
