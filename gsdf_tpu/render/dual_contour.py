"""Dual contouring renderer (reference glrender/dual_contour.go +
dual_contour_vertexplacement.go).

TPU-native restructuring:
- The reference evaluates 4 points per voxel (origin + 3 edge ends,
  dual_contour.go:93-99). Here ONE dense corner grid eval serves every
  voxel: the voxel's origin/edge-end distances are just neighboring grid
  entries — 4x fewer SDF evaluations.
- Active edges are detected by sign-BIT difference (dual_contour.go:262,
  signbit semantics preserved for -0), vectorized over the 3 edge-direction
  grids.
- Normals at edge crossings come from batched central differences on device
  (gleval.NormalsCentralDiff port).
- The per-voxel least-squares vertex placement (QEF) is assembled and
  solved VECTORIZED on host in float64 — the same normalized-voxel
  formulation, regularization sqrt(1e-5), [-0.1, 1.1] clamp and duplicate
  own-edge rows as the reference (dual_contour_vertexplacement.go:25-141).
- Quad emission per active edge with winding flip by edge direction
  (dual_contour.go:152-217).
"""
from __future__ import annotations

import math

import jax
import numpy as np

from ..core.node import Shader3D
from ..eval import evaluator as ev

_f32 = np.float32


class DualContourLeastSquares:
    """Least-squares vertex placement (reference
    dual_contour_vertexplacement.go:18-23)."""

    def __init__(self, chiseled: bool = False):
        self.chiseled = chiseled

    @property
    def norm_step(self) -> float:
        # reference dual_contour_vertexplacement.go:42-46
        return 1e-4 if self.chiseled else 2e-8

    @property
    def sqrt_lambda(self) -> float:
        if self.chiseled:
            return math.sqrt(1e-5) * self.norm_step
        return math.sqrt(1e-5)


class DualContourRenderer:
    """Voxel dual contouring to a quad-derived triangle mesh."""

    def __init__(
        self,
        s: Shader3D,
        res: float,
        contourer: DualContourLeastSquares | None = None,
        device=None,
    ):
        if res <= 0:
            raise ValueError("invalid dual contour resolution")
        self.s = s
        self.res = _f32(res)
        self.contourer = contourer or DualContourLeastSquares()
        self.device = device if device is not None else jax.devices()[0]
        # reference dual_contour.go:31-33: bounds shifted by -res/2 so voxel
        # origins straddle the surface
        bb = s.bounds().add(np.full(3, -res / 2, _f32))
        sz = bb.size()
        self.nx = int(math.ceil(_f32(sz[0]) / self.res)) + 1
        self.ny = int(math.ceil(_f32(sz[1]) / self.res)) + 1
        self.nz = int(math.ceil(_f32(sz[2]) / self.res)) + 1
        self.origin = bb.min
        self._evaluations = 0

    def evaluations(self) -> int:
        """Distinct SDF points evaluated — same contract as
        FlatRenderer.evaluations()."""
        return self._evaluations

    def render(self) -> np.ndarray:
        res = float(self.res)
        # corner grid (planes): voxel (i,j,k) origin distance = grid[k,j,i],
        # its +x/+y/+z edge-end distances are the adjacent entries.
        nk, nj, ni = self.nz + 1, self.ny + 1, self.nx + 1
        grid_dev = ev.evaluate_grid(self.s, self.origin, res, (nk, nj, ni), self.device)
        grid = np.asarray(grid_dev)
        self._evaluations += grid.size

        d0 = grid[: self.nz, : self.ny, : self.nx]
        dx = grid[: self.nz, : self.ny, 1:]
        dy = grid[: self.nz, 1:, : self.nx]
        dz = grid[1:, : self.ny, : self.nx]

        s0 = np.signbit(d0)
        ax = s0 != np.signbit(dx)
        ay = s0 != np.signbit(dy)
        az = s0 != np.signbit(dz)

        with np.errstate(divide="ignore", invalid="ignore"):
            tx = -d0 / (dx - d0)
            ty = -d0 / (dy - d0)
            tz = -d0 / (dz - d0)

        # voxel origin world positions
        kk, jj, ii = np.meshgrid(
            np.arange(self.nz, dtype=_f32),
            np.arange(self.ny, dtype=_f32),
            np.arange(self.nx, dtype=_f32),
            indexing="ij",
        )
        vox_orig = np.stack(
            [
                self.origin[0] + ii * self.res,
                self.origin[1] + jj * self.res,
                self.origin[2] + kk * self.res,
            ],
            axis=-1,
        )

        # crossing points per active edge (world coords)
        def crossings(active, t, axis):
            idx = np.argwhere(active)  # (E,3) [k,j,i]
            pts = vox_orig[active]
            tt = t[active].astype(_f32) * self.res
            pts = pts.copy()
            pts[:, axis] += tt
            return idx, pts

        ex_idx, ex_pts = crossings(ax, tx, 0)
        ey_idx, ey_pts = crossings(ay, ty, 1)
        ez_idx, ez_pts = crossings(az, tz, 2)
        all_pts = np.concatenate([ex_pts, ey_pts, ez_pts], axis=0).astype(_f32)

        # normals via central differences (reference gleval.NormalsCentralDiff)
        sdf = ev.SDF3(self.s, self.device)
        if len(all_pts):
            normals = ev.normals_central_diff(sdf, all_pts, self.contourer.norm_step)
            self._evaluations += 6 * len(all_pts)
        else:
            normals = np.zeros((0, 3), _f32)
        nE = [len(ex_idx), len(ey_idx), len(ez_idx)]
        nml = {
            0: normals[: nE[0]],
            1: normals[nE[0] : nE[0] + nE[1]],
            2: normals[nE[0] + nE[1] :],
        }
        pts_by_axis = {0: ex_pts, 1: ey_pts, 2: ez_pts}
        idx_by_axis = {0: ex_idx, 1: ey_idx, 2: ez_idx}

        # edge slot maps: edge grid -> compact edge index (-1 = inactive)
        def slot_map(active, count):
            m = np.full(active.shape, -1, np.int64)
            m[active] = np.arange(count)
            return m

        mx = slot_map(ax, nE[0])
        my = slot_map(ay, nE[1])
        mz = slot_map(az, nE[2])

        # active voxels: those receiving >= 1 contribution, i.e. any of
        # their 12 edges active (reference: len(cube.Neighbors) > 0)
        def pad_take(m, k, j, i):
            """m[k,j,i] with out-of-range -> -1."""
            valid = (
                (k >= 0) & (k < m.shape[0])
                & (j >= 0) & (j < m.shape[1])
                & (i >= 0) & (i < m.shape[2])
            )
            out = np.full(k.shape, -1, np.int64)
            kk_, jj_, ii_ = k[valid], j[valid], i[valid]
            out[valid] = m[kk_, jj_, ii_]
            return out

        K, J, I = np.meshgrid(
            np.arange(self.nz), np.arange(self.ny), np.arange(self.nx), indexing="ij"
        )
        # the 12 edges of voxel (i,j,k): per axis at the 4 parallel edges.
        # NB: offsets use fresh names — dx/dy/dz hold the distance grids.
        edge_slots = []  # list of (axis, slot_grid) for the 12 edges
        for oy in (0, 1):
            for oz in (0, 1):
                edge_slots.append((0, pad_take(mx, K + oz, J + oy, I)))
        for ox in (0, 1):
            for oz in (0, 1):
                edge_slots.append((1, pad_take(my, K + oz, J, I + ox)))
        for ox in (0, 1):
            for oy in (0, 1):
                edge_slots.append((2, pad_take(mz, K, J + oy, I + ox)))

        any_edge = np.zeros((self.nz, self.ny, self.nx), bool)
        for _, sl in edge_slots:
            any_edge |= sl >= 0
        vidx = np.argwhere(any_edge)  # (V,3) [k,j,i] active voxels
        V = len(vidx)
        if V == 0:
            return np.empty((0, 3, 3), _f32)

        vox_map = np.full((self.nz, self.ny, self.nx), -1, np.int64)
        vox_map[any_edge] = np.arange(V)

        # --- assemble QEF rows: 3 own edges (duplicated, as the reference
        # does) + 12 voxel edges + 3 regularization rows = 18 rows ---------
        R = 18
        A = np.zeros((V, R, 3), np.float64)
        B = np.zeros((V, R), np.float64)
        W = np.zeros((V, R), bool)  # row active mask

        vo = vox_orig[any_edge].astype(np.float64)  # (V,3) voxel origins
        inv_res = 1.0 / res

        def fill_rows(row0, axis, slots_grid):
            sl = slots_grid[any_edge]  # (V,)
            has = sl >= 0
            slv = sl[has]
            q = (pts_by_axis[axis][slv].astype(np.float64) - vo[has]) * inv_res
            n = nml[axis][slv].astype(np.float64)
            A[has, row0, :] = n
            B[has, row0] = np.einsum("ij,ij->i", n, q)
            W[has, row0] = True
            return has, slv, q

        # own edges: the 3 edges at the voxel origin (slots 2, 5... own
        # x-edge is edge_slots[0 + dy=0,dz=0]? own = (dy=0,dz=0) entries)
        own_slots = {0: edge_slots[0][1], 1: edge_slots[4][1], 2: edge_slots[8][1]}
        for r, axis in enumerate((0, 1, 2)):
            fill_rows(r, axis, own_slots[axis])
        for r, (axis, sl) in enumerate(edge_slots):
            fill_rows(3 + r, axis, sl)

        # mean bias over the active (non-reg) rows; count matches the
        # reference's biasVerts length (own + neighbor contributions)
        counts = W.sum(axis=1)
        # bias vert mean in normalized coords: recompute from row data. Rows
        # store b = n.q, not q, so accumulate q separately.
        Qsum = np.zeros((V, 3), np.float64)
        for r, axis in enumerate((0, 1, 2)):
            sl = own_slots[axis][any_edge]
            has = sl >= 0
            slv = sl[has]
            q = (pts_by_axis[axis][slv].astype(np.float64) - vo[has]) * inv_res
            Qsum[has] += q
        for axis, slg in edge_slots:
            sl = slg[any_edge]
            has = sl >= 0
            slv = sl[has]
            q = (pts_by_axis[axis][slv].astype(np.float64) - vo[has]) * inv_res
            Qsum[has] += q
        bias = Qsum / np.maximum(counts, 1)[:, None]

        sq = self.contourer.sqrt_lambda
        for d in range(3):
            A[:, 15 + d, d] = sq
            B[:, 15 + d] = sq * bias[:, d]
            W[:, 15 + d] = True

        # masked least squares via float64 normal equations + regularization
        Am = A * W[:, :, None]
        Bm = B * W
        AtA = np.einsum("vri,vrj->vij", Am, Am)
        Atb = np.einsum("vri,vr->vi", Am, Bm)
        # the sqrt(1e-5) reg rows make AtA nonsingular; solve batched
        x = np.linalg.solve(AtA, Atb[..., None])[..., 0]
        x = np.clip(x, -0.1, 1.1)
        final_verts = (x * res + vo).astype(_f32)  # (V,3)

        # --- quad emission per active edge ---------------------------------
        tris = []

        def emit(axis, idx, flip_vals):
            if len(idx) == 0:
                return
            k, j, i = idx[:, 0], idx[:, 1], idx[:, 2]
            if axis == 0:  # neighbors offsets in (y,z): (-1,-1),(0,-1),(0,0),(-1,0)
                offs = [(0, -1, -1), (0, 0, -1), (0, 0, 0), (0, -1, 0)]
            elif axis == 1:  # (x,z): (-1,-1),(-1,0),(0,0),(0,-1)
                offs = [(-1, 0, -1), (-1, 0, 0), (0, 0, 0), (0, 0, -1)]
            else:  # (x,y): (-1,-1),(0,-1),(0,0),(-1,0)
                offs = [(-1, -1, 0), (0, -1, 0), (0, 0, 0), (-1, 0, 0)]
            corner_ids = []
            all_ok = np.ones(len(idx), bool)
            for (di, dj, dk) in offs:
                vid = pad_take(vox_map, k + dk, j + dj, i + di)
                all_ok &= vid >= 0
                corner_ids.append(vid)
            corner_ids = np.stack(corner_ids, axis=1)  # (E,4)
            corner_ids = corner_ids[all_ok]
            flip = flip_vals[all_ok]
            quads = final_verts[corner_ids]  # (E,4,3)
            quads[flip] = quads[flip][:, ::-1, :]
            tris.append(quads[:, [0, 1, 2], :])
            tris.append(quads[:, [2, 3, 0], :])

        # flip: (edge-end dist - origin dist) < 0 (dual_contour.go:273-275)
        fx = (dx - d0)[ax] < 0
        fy = (dy - d0)[ay] < 0
        fz = (dz - d0)[az] < 0
        emit(0, ex_idx, fx)
        emit(1, ey_idx, fy)
        emit(2, ez_idx, fz)
        if not tris:
            return np.empty((0, 3, 3), _f32)
        self._debug_blocks = [len(t) for t in tris]
        return np.concatenate(tris, axis=0).astype(_f32)


def minecraft_render(s: Shader3D, res: float, device=None) -> np.ndarray:
    """Axis-aligned voxel-face debug render (reference minecraftRender,
    glrender/dual_contour.go:297-403): each sign-crossing voxel edge emits
    the voxel face it pierces, yielding a blocky mesh."""
    dc = DualContourRenderer(s, res, device=device)
    nk, nj, ni = dc.nz + 1, dc.ny + 1, dc.nx + 1
    grid = np.asarray(
        ev.evaluate_grid(dc.s, dc.origin, float(dc.res), (nk, nj, ni), dc.device)
    )
    d0 = grid[: dc.nz, : dc.ny, : dc.nx]
    r = float(dc.res)
    tris = []
    # per axis: face at the edge end, spanned by the two other axes
    specs = [
        (grid[: dc.nz, : dc.ny, 1:], 0, (0, 1, 0), (0, 0, 1)),  # x faces
        (grid[: dc.nz, 1:, : dc.nx], 1, (0, 0, 1), (1, 0, 0)),  # y faces
        (grid[1:, : dc.ny, : dc.nx], 2, (1, 0, 0), (0, 1, 0)),  # z faces
    ]
    for dend, axis, ua, ub in specs:
        active = np.signbit(d0) != np.signbit(dend)
        idx = np.argwhere(active)  # (E,3) [k,j,i]
        if len(idx) == 0:
            continue
        flip = (dend - d0)[active] < 0
        base = np.stack(
            [
                dc.origin[0] + idx[:, 2] * r,
                dc.origin[1] + idx[:, 1] * r,
                dc.origin[2] + idx[:, 0] * r,
            ],
            axis=-1,
        ).astype(_f32)
        base[:, axis] += r  # face sits at the edge end
        a = np.asarray(ua, _f32) * r
        b = np.asarray(ub, _f32) * r
        q0 = base
        q1 = base + a
        q2 = base + a + b
        q3 = base + b
        t1 = np.stack([q0, q1, q2], axis=1)
        t2 = np.stack([q2, q3, q0], axis=1)
        t1[flip] = t1[flip][:, ::-1, :]
        t2[flip] = t2[flip][:, ::-1, :]
        tris.append(t1)
        tris.append(t2)
    if not tris:
        return np.empty((0, 3, 3), _f32)
    return np.concatenate(tris, axis=0).astype(_f32)
