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
    ):
        if cube_resolution <= 0:
            raise ValueError("invalid renderer cube resolution")
        self.s = s
        self.res = _f32(cube_resolution)
        self.device = device if device is not None else jax.devices()[0]
        self.max_slab_points = int(max_slab_points)

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
        return self._evaluations

    def _eval_grid(self):
        """Evaluate all (nz+1,ny+1,nx+1) corners, slab-chunked along z."""
        nk, nj, ni = self.nz + 1, self.ny + 1, self.nx + 1
        plane = nj * ni
        self._evaluations += nk * plane
        if nk * plane <= self.max_slab_points:
            return ev.evaluate_grid(
                self.s, self.origin, self.res, (nk, nj, ni), self.device
            )
        # z-slab chunking: each slab is one fused eval; concatenate on device.
        slab_k = max(1, self.max_slab_points // plane)
        slabs = []
        k = 0
        while k < nk:
            kk = min(slab_k, nk - k)
            origin_k = self.origin + np.array([0, 0, k], _f32) * self.res
            slabs.append(
                ev.evaluate_grid(self.s, origin_k, self.res, (kk, nj, ni), self.device)
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
        if fused and nk * nj * ni <= self.max_slab_points:
            from ..ops.fused_render import fused_render

            self._evaluations += nk * nj * ni
            tris, _, self._size_hint = fused_render(
                self.s,
                self.origin,
                self.res,
                (nk, nj, ni),
                self.device,
                size_hint=getattr(self, "_size_hint", None),
            )
            return tris
        grid = self._eval_grid()
        tris, _ = marching_cubes_grid(grid, self.origin, self.res, self.device)
        return tris


def render_flat(
    s: Shader3D, cube_resolution: float, device=None
) -> np.ndarray:
    return FlatRenderer(s, cube_resolution, device).render()
