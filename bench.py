"""Headline benchmark: npt-flange at resdiv 400, SDF -> STL, warm.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <speedup>}

value        = median wall ms of SDF evaluation + marching cubes + triangle
               fetch + binary STL encode (in-memory), after one warm-up run.
vs_baseline  = baseline_ms / value. Baseline is the reference's best
               SDF->STL on this part: RX 6800 GPU render 706 ms + STL write
               371 ms = 1077 ms (reference README.md:116-117; BASELINE.md).
               >1 means faster than the reference GPU pipeline.

The warm-up run compiles (or loads from the persistent compile cache) every
executable; steady-state production rendering is the regime the reference's
numbers describe (its GLSL compile is likewise excluded from render ms).
"""
import io
import json
import statistics
import sys
import time


def build_flange():
    from gsdf_tpu import Builder
    from gsdf_tpu.forge import threads

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


def build_showerhead():
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "examples"))
    from fibonacci_showerhead import scene

    from gsdf_tpu import Builder

    return scene(Builder())


GOLDEN_FLANGE_TRIS = 423852  # reference README.md:116 / glrender discipline
GOLDEN_SHOWERHEAD_TRIS = 309872  # reference README.md:152


def _bench_part(obj, resdiv, golden, repeats):
    """Median warm SDF->STL wall ms through the compact production path,
    hard-asserting the golden triangle count (golden=None skips the
    assert — examples/breadth_bench.py reuses this harness)."""
    from gsdf_tpu.render.flat import FlatRenderer
    from gsdf_tpu.render.stl import write_binary_stl_indexed

    res = obj.bounds().diagonal() / resdiv

    def run():
        t0 = time.monotonic()
        fr = FlatRenderer(obj, res)
        # compact-field production path: one dispatch, ~1.3 MB fetch,
        # native host decode + indexed STL encode
        verts, tri_idx = fr.render_compact()
        buf = io.BytesIO()
        write_binary_stl_indexed(buf, verts, tri_idx)
        return (time.monotonic() - t0) * 1e3, len(tri_idx)

    # warm-up twice: first compiles (or loads the persistent cache), the
    # second reaches steady state (exact-size buffer hints recorded by
    # the first may compile one minimal-buffer executable)
    _, ntris = run()
    run()
    # the perf number is also a correctness gate: exact reference count
    if golden is not None:
        assert ntris == golden, f"triangle count {ntris} != golden {golden}"
    times = [run()[0] for _ in range(repeats)]  # link noise: take the median
    return statistics.median(times), ntris


def main():
    flange_ms, flange_tris = _bench_part(
        build_flange(), 400, GOLDEN_FLANGE_TRIS, repeats=7
    )
    # secondary gate: the other flagship part (deep tree: 130-hole union +
    # buttress screw + knurl) catches part-specific regressions the flange
    # can't; reference RX 6800 end-to-end is 701 ms (README.md:152-156)
    shower_ms, shower_tris = _bench_part(
        build_showerhead(), 350, GOLDEN_SHOWERHEAD_TRIS, repeats=5
    )
    baseline_ms = 706.0 + 371.0  # reference RX6800 flange render + STL write
    print(
        json.dumps(
            {
                "metric": "npt-flange resdiv400 SDF->STL warm (1 chip)",
                "value": round(flange_ms, 1),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / flange_ms, 2),
                "triangles": flange_tris,
                "secondary": {
                    "metric": "fibonacci-showerhead resdiv350 SDF->STL warm",
                    "value": round(shower_ms, 1),
                    "unit": "ms",
                    "vs_baseline": round(701.0 / shower_ms, 2),
                    "triangles": shower_tris,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
