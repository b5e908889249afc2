"""Chunked differential-fuzz marathon.

Runs every randomized gate (render paths, sharded paths, parametric
binding, GLSL codegen, dual contour) over a wide seed range, sharded
into fresh subprocesses.

Why subprocesses: XLA:CPU segfaults inside backend_compile_and_load
after ~500 fresh-tree compiles in one process (reproduced three times
at the same sequence position on jax 0.9, 2026-08-18 — with AND without
the persistent compile cache, so it is a compile-count limit, not a
cache bug; docs/TESTING.md "Fuzz marathons"). Each chunk therefore gets
its own pytest process via GSDF_TPU_FUZZ_BASE/GSDF_TPU_FUZZ_SEEDS, and
each gate's chunk stays well under the limit.

Usage:
    python examples/fuzz_marathon.py [--seeds 60] [--chunk 20] [--base 0]

--base offsets the whole sweep (seeds [base, base+seeds)) so successive
marathons cover FRESH trees instead of re-proving the first 60.

Exit code 0 = every chunk green. The reference's analogous discipline
is its 10x-seeded randomized unary-op sweep (gsdf_test.go:233-283);
this harness widens that idea to hundreds of whole random trees across
every render/codegen/parametric surface.
"""
import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (pytest node, chunk divisor) — heavier gates get smaller chunks
GATES = [
    "tests/test_fuzz_paths.py::test_all_paths_agree",
    "tests/test_fuzz_paths.py::test_pruned_path_agrees",
    "tests/test_fuzz_paths.py::test_cropped_bounds_paths_agree",
    "tests/test_fuzz_paths.py::test_sharded_paths_agree",
    "tests/test_parametric.py::test_parametric_binding_fuzz",
    "tests/test_glsl_numeric.py::test_glsl_random_tree",
    "tests/test_dual_contour.py::test_dc_fuzz_seeded_trees",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=60, help="seeds per gate")
    ap.add_argument("--chunk", type=int, default=20, help="seeds per process")
    ap.add_argument("--base", type=int, default=0,
                    help="first seed (sweep covers [base, base+seeds))")
    args = ap.parse_args()

    t0 = time.monotonic()
    failures = []
    for gate in GATES:
        for base in range(args.base, args.base + args.seeds, args.chunk):
            n = min(args.chunk, args.base + args.seeds - base)
            env = dict(os.environ)
            env["GSDF_TPU_FUZZ_BASE"] = str(base)
            env["GSDF_TPU_FUZZ_SEEDS"] = str(n)
            # fresh compiles every run: the persistent cache would only
            # accumulate thousands of single-use fuzz-tree entries
            env["GSDF_TPU_NO_COMPILE_CACHE"] = "1"
            label = f"{gate} seeds [{base},{base + n})"
            r = subprocess.run(
                [sys.executable, "-m", "pytest", gate, "-q", "--no-header"],
                cwd=REPO,
                env=env,
                capture_output=True,
                text=True,
            )
            tail = (r.stdout or "").strip().splitlines()
            status = tail[-1] if tail else f"exit {r.returncode}"
            print(f"[{time.monotonic() - t0:7.1f}s] {label}: {status}", flush=True)
            if r.returncode != 0:
                failures.append(label)
                print(r.stdout[-4000:], file=sys.stderr)
    if failures:
        print(f"\nFAILED chunks ({len(failures)}):")
        for f in failures:
            print(" ", f)
        return 1
    print(f"\nall gates green over {args.seeds} seeds "
          f"({time.monotonic() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
