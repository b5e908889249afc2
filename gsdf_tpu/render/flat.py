"""Flat dense-grid renderer — the TPU analog of the reference FlatRenderer
(glrender/flatrenderer.go).

Every unique grid corner is evaluated exactly once. On TPU the whole corner
grid is evaluated as one fused jit call (positions synthesized on device) and
marching cubes runs as vectorized device passes. The goroutine k-plane
partitioning of the reference (flatrenderer.go:103-141) maps to optional
z-slab chunking, which also bounds device memory for huge grids, and to
multi-chip sharding of the slab axis (see gsdf_tpu.parallel).

Grid sizing matches the reference exactly (flatrenderer.go:47-56):
bounds scaled 1.01 centered, n = ceil(size/res) per axis in float32.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.node import Shader3D
from ..eval import evaluator as ev
from ..ops.marching_cubes import marching_cubes_grid

_f32 = np.float32


class FlatRenderer:
    """Dense-grid marching cubes with reference-identical output."""

    def __init__(
        self,
        s: Shader3D,
        cube_resolution: float,
        device=None,
        max_slab_points: int = 1 << 27,
        eval_backend: str = "xla",
    ):
        if cube_resolution <= 0:
            raise ValueError("invalid renderer cube resolution")
        if eval_backend not in ("xla", "pallas"):
            raise ValueError("eval_backend must be 'xla' or 'pallas'")
        self.s = s
        self.res = _f32(cube_resolution)
        self.device = device if device is not None else jax.devices()[0]
        self.max_slab_points = int(max_slab_points)
        #: grid-evaluation backend for the STAGED path (render(fused=False)):
        #: "xla" (default, one fused jit) or "pallas" (explicit VMEM-tiled
        #: kernel, eval.pallas_grid — measured numbers in docs/PERFORMANCE.md)
        self.eval_backend = eval_backend

        bb = s.bounds().scale_centered((1.01, 1.01, 1.01))
        sz = bb.size()
        # float32 division then ceil, matching flatrenderer.go:50-52
        self.nx = int(math.ceil(_f32(sz[0]) / self.res))
        self.ny = int(math.ceil(_f32(sz[1]) / self.res))
        self.nz = int(math.ceil(_f32(sz[2]) / self.res))
        if self.nx <= 0 or self.ny <= 0 or self.nz <= 0:
            raise ValueError("resolution not fine enough for marching cubes")
        self.origin = bb.min
        self._evaluations = 0

    def evaluations(self) -> int:
        """Number of distinct SDF grid points evaluated (reference
        Evaluations(), gleval/cpu.go:126) — uniform meaning across all
        renderers: every renderer counts the points whose distances the
        device actually computed for the returned mesh; grow-and-retry
        re-dispatches of the same grid are counted once."""
        return self._evaluations

    def _eval_grid(self):
        """Evaluate all (nz+1,ny+1,nx+1) corners, slab-chunked along z."""
        nk, nj, ni = self.nz + 1, self.ny + 1, self.nx + 1
        plane = nj * ni
        self._evaluations += nk * plane
        if self.eval_backend == "pallas":
            from ..eval.pallas_grid import evaluate_grid_pallas

            return evaluate_grid_pallas(
                self.s, self.origin, self.res, (nk, nj, ni), self.device
            )
        if nk * plane <= self.max_slab_points:
            return ev.evaluate_grid(
                self.s, self.origin, self.res, (nk, nj, ni), self.device
            )
        # z-slab chunking: each slab is one fused eval; concatenate on
        # device. The slab's GLOBAL layer offset is a traced k0 operand
        # so positions compute as origin + (k0+i)*res — bit-identical to
        # the whole-grid eval (an origin shift, (origin+k*res)+i*res,
        # drifts ~1/3 of coordinates by 1 ulp; the slabbed-path
        # bit-exactness hard rule).
        slab_k = max(1, self.max_slab_points // plane)
        slabs = []
        k = 0
        while k < nk:
            kk = min(slab_k, nk - k)
            slabs.append(
                ev.evaluate_grid(
                    self.s, self.origin, self.res, (kk, nj, ni),
                    self.device, k0=_f32(k),
                )
            )
            k += kk
        return jnp.concatenate(slabs, axis=0)

    def render(self, fused: bool = True) -> np.ndarray:
        """Render to an (T,3,3) float32 triangle array.

        fused=True (default) runs the whole render as one XLA dispatch
        (gsdf_tpu.ops.fused_render); fused=False runs the staged pipeline
        (separate grid eval + MC phases) — same output, used for
        cross-checking and for grids too large for one executable."""
        nk, nj, ni = self.nz + 1, self.ny + 1, self.nx + 1
        if (
            fused
            and self.eval_backend == "xla"
            and nk * nj * ni <= self.max_slab_points
        ):
            return self._render_fused_slabbed()
        grid = self._eval_grid()
        tris, _ = marching_cubes_grid(grid, self.origin, self.res, self.device)
        return tris

    def render_indexed(self, parametric: bool = False):
        """Render to an indexed mesh (verts (V,3) f32, tri_idx (T,3) i32)
        via the welded single-dispatch kernel — the minimal-transfer
        production path. Triangle count matches render(); vertex coords may
        differ in the last ulp (canonical-edge vs per-cube interpolation).

        parametric=True compiles per tree STRUCTURE: mutate the tree's
        continuous parameters (or bind a structurally-identical tree via
        self.s) and re-render without recompiling. The render region and
        resolution stay pinned to this renderer's construction-time values,
        so pin generous bounds (core.wrappers.with_bounds) before editing.

        Grids beyond the memory threshold fall back to the slabbed soup
        path and weld on host."""
        nk, nj, ni = self.nz + 1, self.ny + 1, self.nx + 1
        if nk * nj * ni > self.slab_cubes:
            from ..native import weld

            return weld(self.render(), tol=0.0)
        from ..ops.fused_welded import welded_render

        self._evaluations += nk * nj * ni
        verts, tri_idx, self._welded_hint = welded_render(
            self.s, self.origin, self.res, (nk, nj, ni), self.device,
            size_hint=getattr(self, "_welded_hint", None) if not parametric else None,
            parametric=parametric,
        )
        return verts, tri_idx

    def render_compact(self, parametric: bool = False):
        """Render to an indexed mesh via the COMPACT-FIELD path — the
        minimal-transfer production pipeline (ops/compact_field.py): the
        device ships only active-cube id/case words and edge interpolation
        parameters (~1.3 MB on the flange vs 6 MB welded); the native host
        decoder reconstructs vertices bit-compatibly and walks the MC
        tables (the host-side table walk the reference also performs,
        glrender/octreerenderer.go:131 -> marchcubes.go:34).

        Returns (verts (V,3) f32, tri_idx (T,3) i32) — identical counts
        and connectivity to render_indexed(); vertex coords equal to the
        last ulp. Grids past the single-dispatch memory gate dispatch the
        SAME kernel per z-slab and concatenate payloads (never degrading
        to the soup path — the reference streams any size through fixed
        buffers, glrender/octreerenderer.go:131-178); only an
        unresolvable owner reference (non-Lipschitz fields) or the int32
        id-space limit falls back to render_indexed()."""
        from ..native import mc_decode
        from ..ops.compact_field import (
            MAX_CUBES,
            compact_field_render,
            compact_field_render_slabbed,
        )

        nk, nj, ni = self.nz + 1, self.ny + 1, self.nx + 1
        if self.nx * self.ny * self.nz >= MAX_CUBES:
            return self.render_indexed(parametric=parametric)
        # the compact kernel's live set is ~2 grid-sized arrays (distances
        # + classification) plus surface-sized compaction buffers, so one
        # dispatch scales far past the triangle-emitting paths' threshold;
        # beyond compact_cubes grid points the same kernel runs per z-slab
        if nk * nj * ni > self.compact_cubes:
            ids, cases, tvals, n_pts = compact_field_render_slabbed(
                self.s, self.origin, self.res, (nk, nj, ni), self.device,
                self.compact_cubes, parametric=parametric,
            )
            self._evaluations += n_pts
        else:
            self._evaluations += nk * nj * ni
            ids, cases, tvals, self._compact_hint = compact_field_render(
                self.s, self.origin, self.res, (nk, nj, ni), self.device,
                size_hint=getattr(self, "_compact_hint", None)
                if not parametric
                else None,
                parametric=parametric,
            )
        try:
            return mc_decode(
                ids, cases, tvals, self.nx, self.ny, self.nz,
                self.origin, self.res,
            )
        except ValueError:
            return self.render_indexed(parametric=parametric)

    # Cube count above which the fused path splits into z-slabs. Slab
    # pipelining does NOT help latency on remote-tunnel device links (the
    # link serializes dispatch+transfer; measured 690ms single-shot vs
    # 810ms 4-slab on the flange) so the threshold is set for memory
    # headroom, not overlap: ~48M cubes keeps peak HBM use of the fused
    # executable well under one v5e chip's 16GB.
    slab_cubes = 48_000_000
    # compact-field path memory gate (see render_compact)
    compact_cubes = 256_000_000

    def _render_fused_slabbed(self) -> np.ndarray:
        from ..ops.fused_render import fused_render, fused_render_async

        nk, nj, ni = self.nz + 1, self.ny + 1, self.nx + 1
        self._evaluations += nk * nj * ni
        ncubes = self.nx * self.ny * self.nz
        n_slabs = max(1, min(self.nz, -(-ncubes // self.slab_cubes)))
        if n_slabs == 1:
            tris, _, self._size_hint = fused_render(
                self.s, self.origin, self.res, (nk, nj, ni), self.device,
                size_hint=getattr(self, "_size_hint", None),
            )
            return tris

        hints = getattr(self, "_slab_hints", None)
        if hints is None or len(hints) != n_slabs:
            hints = [None] * n_slabs
        # cube-layer ranges per slab (z-outermost order preserves the
        # reference's global cube order on concatenation)
        bounds_k = [self.nz * s // n_slabs for s in range(n_slabs + 1)]
        pending = []
        for s in range(n_slabs):
            k0, k1 = bounds_k[s], bounds_k[s + 1]
            slab_nk = k1 - k0 + 1  # planes (1-plane overlap with next slab)
            out = fused_render_async(
                self.s, self.origin, self.res, (slab_nk, nj, ni), self.device,
                size_hint=hints[s], k0=float(k0),
            )
            pending.append((s, k0, k1, out))

        parts = []
        new_hints = [None] * n_slabs
        from ..ops.fused_render import _bucket

        for s, k0, k1, (out, n_active, total, sizes) in pending:
            n_active = int(n_active)
            total = int(total)
            a_size, t_size = sizes
            while n_active > a_size or total > t_size:
                if n_active > a_size:
                    a_size = _bucket(n_active)
                if total > t_size:
                    t_size = _bucket(max(total, int(a_size * 5) // 2))
                slab_nk = k1 - k0 + 1
                out, n_active, total, (a_size, t_size) = fused_render_async(
                    self.s, self.origin, self.res, (slab_nk, nj, ni), self.device,
                    size_hint=(a_size, t_size), k0=float(k0),
                )
                n_active = int(n_active)
                total = int(total)
            parts.append(np.asarray(out)[:total])
            new_hints[s] = (_bucket(max(n_active, 1)), _bucket(max(total, 1)))
            from ..ops.fused_render import _hint_cache

            slab_nk = k1 - k0 + 1
            _hint_cache[
                (self.s.tree_hash(), (slab_nk, nj, ni), float(k0))
            ] = new_hints[s]
        self._slab_hints = new_hints
        return np.concatenate(parts, axis=0)


def render_flat(
    s: Shader3D, cube_resolution: float, device=None
) -> np.ndarray:
    return FlatRenderer(s, cube_resolution, device).render()
