"""Headline benchmark: npt-flange at resdiv 400, SDF -> STL, warm.

Driver contract: prints ONE JSON line
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <speedup>}
and hard-asserts the golden triangle counts (flange 423,852 @ resdiv 400,
showerhead 309,872 @ resdiv 350).

The implementation lives in gsdf_tpu.cli (also installed as the
`gsdf-tpu-bench` console script); this shim keeps the repo-root
`python bench.py` contract working from an uninstalled checkout.
"""
from gsdf_tpu.cli import (  # noqa: F401  (re-exported for harness reuse)
    GOLDEN_FLANGE_TRIS,
    GOLDEN_SHOWERHEAD_TRIS,
    _bench_part,
    build_flange,
    build_showerhead,
)
from gsdf_tpu.cli import bench_main as main

if __name__ == "__main__":
    main()
