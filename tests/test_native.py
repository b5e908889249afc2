"""Native layer tests: STL encode parity, weld correctness, OBJ/PLY export."""
import io
import time

import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.native import get_lib, stl_decode, stl_encode, weld
from gsdf_tpu.render import FlatRenderer
from gsdf_tpu.render.stl import _STL_DTYPE, triangle_normals, write_binary_stl

bld = Builder()


def _numpy_encode(tris):
    rec = np.zeros(len(tris), dtype=_STL_DTYPE)
    rec["normal"] = triangle_normals(tris)
    rec["v1"] = tris[:, 0]
    rec["v2"] = tris[:, 1]
    rec["v3"] = tris[:, 2]
    return rec.tobytes()


def test_native_builds():
    assert get_lib() is not None, "native library failed to build"


def test_stl_encode_matches_numpy():
    rng = np.random.default_rng(3)
    tris = rng.normal(size=(500, 3, 3)).astype(np.float32)
    a = stl_encode(tris)
    b = _numpy_encode(tris)
    # normals may differ in the last ulp from operation ordering; compare
    # vertices bit-exactly, normals with tolerance
    ra = np.frombuffer(a, dtype=_STL_DTYPE)
    rb = np.frombuffer(b, dtype=_STL_DTYPE)
    np.testing.assert_array_equal(ra["v1"], rb["v1"])
    np.testing.assert_array_equal(ra["v2"], rb["v2"])
    np.testing.assert_array_equal(ra["v3"], rb["v3"])
    np.testing.assert_allclose(ra["normal"], rb["normal"], atol=1e-6)


def test_stl_roundtrip_native():
    tris = FlatRenderer(bld.new_sphere(0.6), 0.05).render()
    data = stl_encode(tris)
    back = stl_decode(data, len(tris))
    np.testing.assert_array_equal(tris, back)


def test_weld_sphere():
    tris = FlatRenderer(bld.new_sphere(0.6), 0.05).render()
    verts, idx = weld(tris)
    assert idx.shape == (len(tris), 3)
    # reconstruction is exact with tol=0 (only exact duplicates merged)
    np.testing.assert_array_equal(verts[idx], tris)

    # with a small tolerance, ULP-level cracks between adjacent cubes merge
    # (per-cube corner arithmetic differs in the last ulp, exactly as in the
    # reference's flat renderer) and the mesh closes: V - E + F = 2, E=3F/2
    verts, idx = weld(tris, tol=1e-6)
    np.testing.assert_allclose(verts[idx], tris, atol=1e-5)
    F = len(tris)
    V = len(verts)
    # quantized welding can leave a handful of unmerged boundary-cell
    # vertices; the mesh must be within a few vertices of Euler-closed
    euler_v = (3 * F) // 2 - F + 2
    assert abs(V - euler_v) <= 8, f"V={V}, expected ~{euler_v} (F={F})"


def test_obj_ply_export(tmp_path):
    from gsdf_tpu.render.mesh_export import write_obj_file, write_ply_file

    tris = FlatRenderer(bld.new_box(1, 1, 1, 0.1), 0.1).render()
    obj_p = tmp_path / "m.obj"
    ply_p = tmp_path / "m.ply"
    write_obj_file(str(obj_p), tris)
    write_ply_file(str(ply_p), tris)
    txt = obj_p.read_text()
    assert txt.count("f ") == len(tris)
    data = ply_p.read_bytes()
    assert data.startswith(b"ply\n")
