"""Shared example CLI: the -gpu/-res/-resdiv flag convention of the
reference examples (e.g. examples/npt-flange/flange.go:63-70)."""
import argparse

try:  # installed package (pip install -e .) needs no path games
    import gsdf_tpu  # noqa: F401
except ImportError:  # uninstalled checkout: repo root is examples/..
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
    ap.add_argument(
        "--pruned", action="store_true",
        help="use the pruned tile renderer (octree-equivalent)",
    )
    ap.add_argument("--out", default=None, help="output STL path")
    for name, (default, help_) in extra.items():
        ap.add_argument(f"--{name}", type=type(default), default=default, help=help_)
    return ap.parse_args()


def render_stl(obj, name, args, visual=True):
    from gsdf_tpu.pipeline import RenderConfig, render_shader3d

    res = args.res or obj.bounds().diagonal() / args.resdiv
    out = args.out or f"{name}.stl"
    if getattr(args, "pruned", False):
        import time

        import jax

        from gsdf_tpu.render import PrunedRenderer, write_stl_file

        device = jax.devices("cpu")[0] if args.cpu else None
        pr = PrunedRenderer(obj, res, device=device)
        t0 = time.monotonic()
        tris = pr.render()
        dt = time.monotonic() - t0
        write_stl_file(out, tris)
        pct = 100.0 * pr.total_pruned() / max(pr.total_pruned() + pr.evaluations(), 1)
        print(
            f"[{dt:.3f}s] pruned render: {pr.evaluations()} evals "
            f"({pct:.1f}% of fine evals pruned) -> {len(tris)} triangles"
        )
        print(f"finished {name}: {len(tris)} triangles -> {out}")
        return {"triangles": len(tris), "evaluations": pr.evaluations()}
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
