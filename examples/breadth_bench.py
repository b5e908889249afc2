"""Breadth benchmark: every flagship part through the production
compact path, warm SDF->STL (in-memory), one row per part.

This is the committed, reproducible source of docs/PERFORMANCE.md's
breadth table (the bench.py method applied to all parts):
  res = bounds().diagonal() / resdiv, FlatRenderer.render_compact(),
  indexed in-memory STL encode, median of 7 after two warm-ups.

Run on the chip: python examples/breadth_bench.py
"""
import io
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])


def bench_part(name, obj, resdiv):
    from gsdf_tpu.render.flat import FlatRenderer
    from gsdf_tpu.render.stl import write_binary_stl_indexed

    res = obj.bounds().diagonal() / resdiv

    def run():
        t0 = time.monotonic()
        fr = FlatRenderer(obj, res)
        verts, tri_idx = fr.render_compact()
        buf = io.BytesIO()
        write_binary_stl_indexed(buf, verts, tri_idx)
        return (time.monotonic() - t0) * 1e3, len(tri_idx)

    run()
    run()
    times, n = [], 0
    for _ in range(7):
        ms, n = run()
        times.append(ms)
    print(
        f"{name} resdiv{resdiv}: {n:,} tris "
        f"{statistics.median(times):.0f} ms",
        flush=True,
    )


def main():
    from bench import build_flange, build_showerhead

    import bolt as bolt_mod
    import knurled_cylinder as kc_mod

    from gsdf_tpu import Builder

    bench_part("npt-flange", build_flange(), 400)
    bench_part("fibonacci-showerhead", build_showerhead(), 350)
    bench_part("iso-m3-bolt", bolt_mod.scene(Builder()), 300)
    bench_part("knurled-cylinder", kc_mod.build_shape(Builder()), 350)


if __name__ == "__main__":
    main()
