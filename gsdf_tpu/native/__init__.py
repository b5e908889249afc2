"""Native (C++) runtime components, loaded via ctypes.

Build on demand (cached .so); every entry point has a numpy fallback so the
framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_f32 = np.float32
_HERE = os.path.dirname(__file__)
_SO_PATH = os.path.join(_HERE, "libgsdfnative.so")
_SRC = os.path.join(_HERE, "native.cpp")

_lib = None
_tried = False


def _build(dst: str = _SO_PATH) -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                # deterministic f32: no FMA contraction, so vertex
                # reconstruction (gsdf_mc_decode) is reproducible and
                # matches the documented reference arithmetic
                "-ffp-contract=off",
                "-pthread",
                "-o", dst, _SRC,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library or None (numpy fallbacks used)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC):
        if not _build():
            return None
    if _register(_SO_PATH):
        return _lib
    # A stale prebuilt .so can miss a newer entry point even with a
    # fresh mtime (checkout order). Rebuilding in place cannot help
    # in-process: dlopen dedupes by path and would return the already-
    # loaded stale handle (and rebuilding over a mapped file mutates
    # the mapped image). Build to a FRESH path, load that, then promote
    # it to the canonical name for future processes; the temp file can
    # be unlinked once mapped.
    tmp = f"{_SO_PATH}.fresh.{os.getpid()}"
    if _build(tmp):
        if _register(tmp):
            try:
                os.replace(tmp, _SO_PATH)
            except OSError:
                pass
        try:
            os.unlink(tmp)
        except OSError:
            pass
    return _lib


def _register(path: str) -> bool:
    global _lib
    try:
        lib = ctypes.CDLL(path)
        lib.gsdf_stl_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.gsdf_stl_decode.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gsdf_stl_decode.restype = ctypes.c_int64
        lib.gsdf_weld.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gsdf_weld.restype = ctypes.c_int64
        lib.gsdf_mc_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),  # ids
            ctypes.POINTER(ctypes.c_uint8),  # cases
            ctypes.c_int64,  # n_active
            ctypes.POINTER(ctypes.c_float),  # tvals
            ctypes.c_int64,  # n_verts
            ctypes.c_int32,  # nx
            ctypes.c_int32,  # ny
            ctypes.c_int32,  # nz
            ctypes.POINTER(ctypes.c_float),  # origin[3]
            ctypes.c_float,  # res
            ctypes.POINTER(ctypes.c_int8),  # tri_table
            ctypes.POINTER(ctypes.c_uint8),  # tri_count
            ctypes.POINTER(ctypes.c_uint8),  # edge_axis
            ctypes.POINTER(ctypes.c_int8),  # edge_low
            ctypes.POINTER(ctypes.c_float),  # verts_out
            ctypes.POINTER(ctypes.c_int32),  # tri_idx_out
        ]
        lib.gsdf_mc_decode.restype = ctypes.c_int64
        lib.gsdf_stl_encode_indexed.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.gsdf_dc_finish.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # verts (kernel slots)
            ctypes.POINTER(ctypes.c_int64),  # eax
            ctypes.POINTER(ctypes.c_int64),  # lin
            ctypes.POINTER(ctypes.c_uint8),  # flips
            ctypes.c_int64,  # n_edges
            ctypes.c_int32,  # nx
            ctypes.c_int32,  # ny
            ctypes.c_int32,  # nz
            ctypes.c_int64,  # n_vox
            ctypes.POINTER(ctypes.c_int32),  # offs (3,4,3)
            ctypes.POINTER(ctypes.c_float),  # tris_out (2n cap)
            ctypes.POINTER(ctypes.c_int64),  # blocks_out (6,)
            ctypes.c_int32,  # force_sort (tests' huge-grid lever)
        ]
        lib.gsdf_dc_finish.restype = ctypes.c_int64
        _lib = lib
        return True
    except (OSError, AttributeError):
        _lib = None
        return False


def stl_encode(tris: np.ndarray) -> bytes:
    """(T,3,3) float32 -> STL record bytes (T*50). Native with numpy
    fallback."""
    tris = np.ascontiguousarray(tris, _f32)
    n = tris.shape[0]
    lib = get_lib()
    if lib is None:
        from ..render.stl import _STL_DTYPE, triangle_normals

        rec = np.zeros(n, dtype=_STL_DTYPE)
        rec["normal"] = triangle_normals(tris)
        rec["v1"] = tris[:, 0]
        rec["v2"] = tris[:, 1]
        rec["v3"] = tris[:, 2]
        return rec.tobytes()
    out = np.empty(n * 50, np.uint8)
    lib.gsdf_stl_encode(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out.tobytes()


def stl_decode(records: bytes, count: int) -> np.ndarray:
    lib = get_lib()
    buf = np.frombuffer(records, np.uint8, count=count * 50)
    if lib is None:
        from ..render.stl import _STL_DTYPE

        rec = np.frombuffer(records, dtype=_STL_DTYPE, count=count)
        return np.stack([rec["v1"], rec["v2"], rec["v3"]], axis=1).astype(_f32)
    tris = np.empty((count, 3, 3), _f32)
    lib.gsdf_stl_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        count,
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return tris


def weld(tris: np.ndarray, tol: float = 0.0):
    """Triangle soup -> (verts (V,3), indices (T,3)) indexed mesh.

    tol quantizes coordinates for merging; 0 merges exact duplicates only.
    """
    tris = np.ascontiguousarray(tris, _f32)
    n = tris.shape[0]
    if n == 0:
        return np.empty((0, 3), _f32), np.empty((0, 3), np.int32)
    lib = get_lib()
    if lib is None:
        flat = tris.reshape(-1, 3)
        q = flat if tol <= 0 else np.round(flat / tol) * tol
        uniq, idx = np.unique(
            q.view([("", _f32)] * 3), return_inverse=True
        )
        verts_map: dict = {}
        verts = []
        indices = np.empty(len(flat), np.int32)
        for i, key in enumerate(idx.ravel()):
            if key not in verts_map:
                verts_map[key] = len(verts)
                verts.append(flat[i])
            indices[i] = verts_map[key]
        return np.array(verts, _f32), indices.reshape(-1, 3)
    verts = np.empty((n * 3, 3), _f32)
    idx = np.empty(n * 3, np.int32)
    nv = lib.gsdf_weld(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.c_float(tol),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return verts[:nv].copy(), idx.reshape(-1, 3)


def _mc_host_tables():
    """Flattened table views for the decoder, built once from the single
    canonical source (ops/mc_tables.py, ops/mc_emit.py)."""
    global _MC_HOST_TABLES
    try:
        return _MC_HOST_TABLES
    except NameError:
        pass
    from ..ops import mc_emit
    from ..ops.mc_tables import MC_TRI_COUNT, MC_TRI_TABLE

    _MC_HOST_TABLES = (
        np.ascontiguousarray(MC_TRI_TABLE, np.int8),  # (256,5,3)
        np.ascontiguousarray(MC_TRI_COUNT, np.uint8),  # (256,)
        np.ascontiguousarray(mc_emit.EDGE_AXIS, np.uint8),  # (12,)
        np.ascontiguousarray(mc_emit.EDGE_LOW, np.int8),  # (12,3)
    )
    return _MC_HOST_TABLES


def _crossing_bits(idx8):
    """Which of the 3 owner (low) edges cross, straight from the case
    byte's sign bits — bit k is the sign of corner k."""
    b0 = idx8 & 1
    return np.stack(
        [
            b0 != ((idx8 >> 1) & 1),
            b0 != ((idx8 >> 3) & 1),
            b0 != ((idx8 >> 4) & 1),
        ],
        axis=-1,
    )  # (A,3) bool


def _mc_decode_numpy(ids, cases, tvals, nx, ny, nz, origin, res):
    """Vectorized fallback decoder (same output as gsdf_mc_decode)."""
    tri_table, tri_count, edge_axis, edge_low = _mc_host_tables()
    ids = ids.astype(np.int64)
    if len(ids) and int(ids.max()) >= nx * ny * nz:
        # same clean failure as the native decoder's pass-1 id check
        raise ValueError("cube id outside decode space")
    idx8 = cases.astype(np.int32)
    A = len(ids)
    ci = (ids % nx).astype(np.int32)
    cj = ((ids // nx) % ny).astype(np.int32)
    ck = (ids // (nx * ny)).astype(np.int32)

    cross = _crossing_bits(idx8)  # (A,3)
    nvert_per = cross.sum(axis=1)
    vbase = np.zeros(A + 1, np.int64)
    np.cumsum(nvert_per, out=vbase[1:])
    n_verts = int(vbase[-1])
    if n_verts != len(tvals):
        raise ValueError("payload vertex count mismatch")

    # vertices: flat (cube-major, axis x,y,z) order matches the device scan
    flat = cross.reshape(-1)
    where = np.nonzero(flat)[0]
    vcube = (where // 3).astype(np.int64)
    vaxis = (where % 3).astype(np.int64)
    res32 = _f32(res)
    origin = np.asarray(origin, _f32)
    pa = np.stack(
        [
            origin[0] + ci.astype(_f32) * res32,
            origin[1] + cj.astype(_f32) * res32,
            origin[2] + ck.astype(_f32) * res32,
        ],
        axis=-1,
    )  # (A,3) f32
    verts = pa[vcube].copy()
    paa = verts[np.arange(n_verts), vaxis]
    pb = (paa + res32).astype(_f32)
    t = np.asarray(tvals, _f32)
    interp = (paa + t * (pb - paa)).astype(_f32)
    verts[np.arange(n_verts), vaxis] = np.where(t == 1.0, pb, interp)

    # triangles: table walk vectorized over (A,5,3)
    tbl = tri_table.astype(np.int32)[idx8]  # (A,5,3), -1 padded
    counts = tri_count[idx8].astype(np.int32)  # (A,)
    e = np.maximum(tbl, 0)
    eax = edge_axis.astype(np.int64)[e]  # (A,5,3)
    elow = edge_low.astype(np.int64)[e]  # (A,5,3,3)
    oi = ci[:, None, None] + elow[..., 0]
    oj = cj[:, None, None] + elow[..., 1]
    ok = ck[:, None, None] + elow[..., 2]
    valid = np.arange(5, dtype=np.int32)[None, :] < counts[:, None]  # (A,5)
    # owner coord past the decode space (surface touching the grid's max
    # boundary face, e.g. with_bounds-cropped renders) must fail exactly
    # like the native decoder's oi>=nx check so both paths take the same
    # welded fallback — never silently bind a wrong vertex via clamping
    oob = (oi >= nx) | (oj >= ny) | (ok >= nz)  # (A,5,3)
    if (oob & valid[:, :, None]).any():
        raise ValueError("owner cube outside decode space")
    oi, oj, ok = np.where(oob, 0, oi), np.where(oob, 0, oj), np.where(oob, 0, ok)
    owner_lin = (ok * ny + oj) * nx + oi  # (A,5,3)
    slot_map = np.full(nx * ny * nz, -1, np.int32)
    slot_map[ids] = np.arange(A, dtype=np.int32)
    oslot = slot_map[owner_lin]  # (A,5,3)
    if (oslot < 0)[valid].any():
        raise ValueError("unresolved owner cube (non-Lipschitz field?)")
    os_safe = np.maximum(oslot, 0)
    ocross = _crossing_bits(idx8[os_safe]).astype(np.int64)  # (A,5,3,3)
    rank = np.where(
        eax == 0, 0, np.where(eax == 1, ocross[..., 0], ocross[..., 0] + ocross[..., 1])
    )
    vid = vbase[os_safe] + rank  # (A,5,3)
    vid = vid[:, :, ::-1]  # reference winding (reversed triples)
    tri_idx = vid[valid].astype(np.int32)  # compact valid rows -> (T,3)
    return verts, tri_idx


def mc_decode(ids, cases, tvals, nx, ny, nz, origin, res):
    """Decode a compact-field payload into an indexed mesh.

    ids (A,) uint32 active cube linear ids; cases (A,) uint8 MC case
    bytes; tvals (V,) f32 interpolation parameters. Returns
    (verts (V,3) f32, tri_idx (T,3) i32). Raises ValueError when an owner
    reference is unresolvable (caller falls back to the welded path)."""
    ids = np.ascontiguousarray(ids, np.uint32)
    cases = np.ascontiguousarray(cases, np.uint8)
    tvals = np.ascontiguousarray(tvals, _f32)
    lib = get_lib()
    if lib is None:
        return _mc_decode_numpy(ids, cases, tvals, nx, ny, nz, origin, res)
    tri_table, tri_count, edge_axis, edge_low = _mc_host_tables()
    n_active = len(ids)
    n_verts = len(tvals)
    total = int(tri_count[cases].astype(np.int64).sum())
    verts = np.empty((n_verts, 3), _f32)
    tri_idx = np.empty((total, 3), np.int32)
    origin32 = np.ascontiguousarray(origin, _f32)
    got = lib.gsdf_mc_decode(
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_active,
        tvals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_verts,
        nx,
        ny,
        nz,
        origin32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(res),
        tri_table.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        tri_count.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        edge_axis.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        edge_low.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tri_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if got != total:
        raise ValueError(
            f"mc_decode failed (got {got}, expected {total}): "
            "unresolved owner cube (non-Lipschitz field?)"
        )
    return verts, tri_idx


def stl_encode_indexed(verts: np.ndarray, tri_idx: np.ndarray) -> bytes:
    """Indexed mesh -> STL record bytes (T*50), gather+normal+pack in one
    native pass. Numpy fallback composes the soup encoder."""
    verts = np.ascontiguousarray(verts, _f32)
    tri_idx = np.ascontiguousarray(tri_idx, np.int32)
    n = tri_idx.shape[0]
    lib = get_lib()
    if lib is None:
        return stl_encode(verts[tri_idx])
    out = np.empty(n * 50, np.uint8)
    lib.gsdf_stl_encode_indexed(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tri_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out.tobytes()


def dc_finish(verts, eax, lin, flips, nx, ny, nz, n_vox, offs,
              force_sort=False):
    """Native dual-contour quad emission (gsdf_dc_finish): gathers final
    triangles from the v2 DC mesh payload's per-edge arrays. Returns
    (tris (T,3,3) f32, blocks) or None when the native library is
    unavailable — the caller (render/dual_contour.finish_dc_mesh) then
    runs its numpy implementation, which is the bit-exact oracle this
    path is pinned against in tests. `offs` is the (3,4,3) quad-corner
    offset table from the single Python source (dual_contour._OFFS).
    force_sort=True selects the sorted-table rank backend (used for
    voxel-id spaces past the 2^28-bit bitmap; tests cover it here)."""
    lib = get_lib()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, _f32)
    eax = np.ascontiguousarray(eax, np.int64)
    lin = np.ascontiguousarray(lin, np.int64)
    flips = np.ascontiguousarray(flips, np.uint8)
    offs = np.ascontiguousarray(offs, np.int32)
    n = len(eax)
    tris = np.empty((2 * n, 3, 3), _f32)
    blocks6 = np.zeros(6, np.int64)
    got = lib.gsdf_dc_finish(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        eax.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lin.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        nx,
        ny,
        nz,
        n_vox,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        blocks6.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        1 if force_sort else 0,
    )
    if got == -(2**63):  # INT64_MIN: edge axis/lin outside the grid
        raise RuntimeError("corrupt DC payload: edge id out of range")
    if got < 0:
        raise RuntimeError(
            f"DC payload voxel-count mismatch: derived {-int(got) - 1} "
            f"!= kernel {n_vox}"
        )
    blocks = [int(b) for a in range(3) if blocks6[2 * a] for b in blocks6[2 * a : 2 * a + 2]]
    return tris[:got].copy(), blocks
