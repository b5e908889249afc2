"""Shared example CLI: the -gpu/-res/-resdiv flag convention of the
reference examples (e.g. examples/npt-flange/flange.go:63-70)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def example_args(resdiv_default=200, **extra):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=float, default=0.0, help="resolution in shape units")
    ap.add_argument(
        "--resdiv", type=int, default=resdiv_default,
        help="bounding-diagonal divisions",
    )
    ap.add_argument("--cpu", action="store_true", help="render on host CPU")
    ap.add_argument("--out", default=None, help="output STL path")
    for name, (default, help_) in extra.items():
        ap.add_argument(f"--{name}", type=type(default), default=default, help=help_)
    return ap.parse_args()


def render_stl(obj, name, args, visual=True):
    from gsdf_tpu.pipeline import RenderConfig, render_shader3d

    res = args.res or obj.bounds().diagonal() / args.resdiv
    out = args.out or f"{name}.stl"
    with open(out, "wb") as f:
        vis_file = None
        try:
            if visual:
                vis_file = open(f"{name}.glsl", "w")
            stats = render_shader3d(
                obj,
                RenderConfig(
                    stl_output=f,
                    visual_output=vis_file,
                    resolution=res,
                    use_gpu=not args.cpu,
                ),
            )
        finally:
            if vis_file:
                vis_file.close()
    print(f"finished {name}: {stats['triangles']} triangles -> {out}")
    return stats
