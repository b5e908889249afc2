"""Standalone acceptance harness (reference examples/test/glsdf3test.go):
cross-validates the accelerator path against the CPU oracle point-by-point
for a battery of shapes, exercises the special evaluators, and times an
octree-style STL generation roundtrip.

Run as a program: `python examples/acceptance.py [--tol 5e-3]`.
The reference compares CPU vs GPU at 5e-3 abs (gsdf_test.go:529); here both
paths run the same jnp code so agreement is typically at float32 ulps.
"""
import argparse
import io
import time

import numpy as np

from _common import example_args  # noqa: F401  (sets sys.path)

import jax

from gsdf_tpu import Builder
from gsdf_tpu.eval import new_sdf2, new_sdf3
from gsdf_tpu.eval.special import displace_multi2d, lines2d_gpu, polygon_gpu
from gsdf_tpu.forge import threads
from gsdf_tpu.render import FlatRenderer, read_binary_stl, write_binary_stl
from gsdf_tpu.render.pruned import PrunedRenderer

bld = Builder()


def battery_3d():
    s = bld
    screw = threads.screw(s, 2.0, threads.ISO(d=3, p=0.5, ext=True))
    return [
        ("sphere", s.new_sphere(0.7)),
        ("box", s.new_box(1, 0.8, 0.6, 0.1)),
        ("cylinder", s.new_cylinder(0.5, 1.2, 0.1)),
        ("torus", s.new_torus(1.0, 0.3)),
        ("hex", s.new_hexagonal_prism(0.6, 0.4)),
        ("boxframe", s.new_box_frame(1, 1, 1, 0.1)),
        ("union", s.union(s.new_sphere(0.5), s.translate(s.new_box(0.4, 0.4, 0.4, 0), 0.4, 0, 0))),
        ("smooth_diff", s.smooth_difference(0.1, s.new_sphere(0.6), s.new_cylinder(0.3, 2, 0))),
        ("twisted_circ_array", s.twist(s.circular_array(s.translate(s.new_box(0.2, 0.2, 1, 0), 0.8, 0, 0), 8, 8), 0.5)),
        ("screw_iso_m3", screw),
        ("extrude_poly", s.extrude(s.new_polygon([(-0.5, -0.4), (0.5, -0.5), (0.4, 0.5), (-0.3, 0.35)]), 0.8)),
        ("revolve", s.revolve(s.translate2d(s.new_circle(0.2), 0.8, 0), 0)),
    ]


def cross_validate(tol):
    rng = np.random.default_rng(1)
    cpu = jax.devices("cpu")[0]
    acc = jax.devices()[0]
    worst = 0.0
    print(f"accelerator: {acc}, oracle: {cpu}")
    for name, shape in battery_3d():
        bb = shape.bounds()
        lo, hi = bb.min, bb.max
        pts = rng.uniform(0, 1, (8192, 3)).astype(np.float32) * (hi - lo) * 1.4 + lo - 0.2 * (hi - lo)
        d_cpu = new_sdf3(shape, cpu).evaluate(pts)
        d_acc = new_sdf3(shape, acc).evaluate(pts)
        diff = float(np.max(np.abs(d_cpu - d_acc)))
        worst = max(worst, diff)
        status = "ok" if diff <= tol else "FAIL"
        print(f"  {name:22s} max|cpu-acc| = {diff:.3e}  {status}")
        if diff > tol:
            raise SystemExit(f"{name}: cross-validation failure ({diff} > {tol})")
    print(f"worst case: {worst:.3e} (tolerance {tol})")


def special_evaluators(tol):
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (4096, 2)).astype(np.float32)
    verts = [(-0.5, -0.4), (0.5, -0.5), (0.4, 0.5), (-0.3, 0.35)]
    d1 = polygon_gpu(verts).evaluate(pts)
    d2 = new_sdf2(bld.new_polygon(verts), jax.devices("cpu")[0]).evaluate(pts)
    assert np.max(np.abs(d1 - d2)) <= tol, "PolygonGPU mismatch"
    segs = [[(0, 0), (1, 0)], [(1, 0), (1, 1)]]
    d1 = lines2d_gpu(segs, 0.1).evaluate(pts)
    d2 = new_sdf2(bld.new_lines2d(segs, 0.1), jax.devices("cpu")[0]).evaluate(pts)
    assert np.max(np.abs(d1 - d2)) <= tol, "Lines2DGPU mismatch"
    print("  special evaluators: ok")
    # throughput battery (the reference's purpose for these evaluators,
    # glsdf3test.go:55-66)
    from gsdf_tpu.eval.special import run_benchmarks

    run_benchmarks(1 << 18, log=lambda m: print("  " + m))


def stl_roundtrip_timing():
    part = bld.difference(
        bld.smooth_union(0.2, bld.new_sphere(0.8), bld.new_box(1.2, 1.2, 0.5, 0.05)),
        bld.new_cylinder(0.3, 4.0, 0.0),
    )
    res = part.bounds().diagonal() / 200
    fr = FlatRenderer(part, res)
    tris = fr.render()  # warm compile
    t0 = time.monotonic()
    tris = fr.render()
    t_render = time.monotonic() - t0
    buf = io.BytesIO()
    t0 = time.monotonic()
    write_binary_stl(buf, tris)
    t_stl = time.monotonic() - t0
    buf.seek(0)
    back = read_binary_stl(buf)
    assert np.array_equal(tris, back), "STL roundtrip mismatch"
    pr = PrunedRenderer(part, res)
    tris_p = pr.render()
    assert len(tris_p) == len(tris), "pruned/flat count mismatch"
    print(
        f"  stl roundtrip: {len(tris)} triangles, render {t_render*1e3:.0f}ms, "
        f"stl {t_stl*1e3:.1f}ms; pruned renderer count parity ok "
        f"({pr.evaluations()} vs {fr.evaluations()} evals)"
    )


def dual_contour_check():
    """Device f32 QEF vs the float64 host oracle ON THE ACCELERATOR
    (both paths share the accelerator's edge field, so counts must be
    identical and vertices agree to f32 solve round-off — the acceptance
    twin of tests/test_dual_contour.py::test_dc_device_matches_host_oracle)."""
    from gsdf_tpu.render.dual_contour import DualContourRenderer

    part = bld.difference(
        bld.smooth_union(0.2, bld.new_sphere(0.8), bld.new_box(1.2, 1.2, 0.5, 0.05)),
        bld.new_cylinder(0.3, 4.0, 0.0),
    )
    res = part.bounds().diagonal() / 150
    acc = jax.devices()[0]
    th = DualContourRenderer(part, res, host_qef=True, device=acc).render()
    dc = DualContourRenderer(part, res, device=acc)
    td = dc.render()
    assert len(th) == len(td), f"DC count mismatch: oracle {len(th)} vs device {len(td)}"
    dev = float(np.abs(th - td).max())
    assert dev < 1e-3 * res, f"DC vertex deviation {dev} >= {1e-3 * res}"
    t0 = time.monotonic()
    dc.render()
    t_warm = time.monotonic() - t0
    print(
        f"  dual contour: {len(td)} triangles, device-vs-f64-oracle max "
        f"deviation {dev:.2e} (< {1e-3 * res:.2e}), warm render {t_warm*1e3:.0f}ms"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=5e-3)
    args = ap.parse_args()
    print("== cross-validation: accelerator vs CPU oracle ==")
    cross_validate(args.tol)
    print("== special evaluators ==")
    special_evaluators(args.tol)
    print("== STL generation ==")
    stl_roundtrip_timing()
    print("== dual contouring ==")
    dual_contour_check()
    print("acceptance harness passed")
