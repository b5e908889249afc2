"""Breadth benchmark: every flagship part through the production
compact path, warm SDF->STL (in-memory), one row per part.

This is the committed, reproducible source of docs/PERFORMANCE.md's
breadth table. It reuses bench.py's `_bench_part` harness verbatim
(two warm-ups, median of 7, in-memory indexed STL encode) so the rows
are directly comparable to the headline bench.py number; the flange
and showerhead rows also assert their golden counts.

Run on the chip: python examples/breadth_bench.py
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    from bench import (
        GOLDEN_FLANGE_TRIS,
        GOLDEN_SHOWERHEAD_TRIS,
        _bench_part,
        build_flange,
        build_showerhead,
    )

    import bolt as bolt_mod
    import knurled_cylinder as kc_mod

    from gsdf_tpu import Builder

    rows = [
        ("npt-flange", build_flange(), 400, GOLDEN_FLANGE_TRIS),
        ("fibonacci-showerhead", build_showerhead(), 350, GOLDEN_SHOWERHEAD_TRIS),
        # these two counts are regression gates too (docs/PERFORMANCE.md)
        ("iso-m3-bolt", bolt_mod.scene(Builder()), 300, 137192),
        ("knurled-cylinder", kc_mod.build_shape(Builder()), 350, 617460),
    ]
    for name, obj, resdiv, golden in rows:
        ms, n = _bench_part(obj, resdiv, golden, repeats=7)
        print(f"{name} resdiv{resdiv}: {n:,} tris {ms:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
