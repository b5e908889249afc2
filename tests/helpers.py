"""Shared test helpers mirroring the reference's property-test strategy
(gsdf_test.go:772-910): bounds positivity, 1-Lipschitz field validity,
outward normals."""
import numpy as np

from gsdf_tpu.eval import new_cpu_sdf3, new_sdf2, normals_central_diff

_f32 = np.float32


def grid_points_3d(bb, n=12, scale=1.0):
    """Dense grid of points covering bb (optionally scaled about center)."""
    c = bb.center()
    lo = c + (bb.min - c) * scale
    hi = c + (bb.max - c) * scale
    xs = [np.linspace(lo[i], hi[i], n, dtype=_f32) for i in range(3)]
    g = np.stack(np.meshgrid(*xs, indexing="ij"), axis=-1).reshape(-1, 3)
    return g.astype(_f32)


def grid_points_2d(bb, n=24, scale=1.0):
    c = bb.center()
    lo = c + (bb.min - c) * scale
    hi = c + (bb.max - c) * scale
    xs = [np.linspace(lo[i], hi[i], n, dtype=_f32) for i in range(2)]
    g = np.stack(np.meshgrid(*xs, indexing="ij"), axis=-1).reshape(-1, 2)
    return g.astype(_f32)


def assert_bounds_valid_3d(shape, n=8):
    """No point outside the bounding box may have negative distance, and
    central-difference normals at offset boxes must point away from the
    center (reference test_bounds, gsdf_test.go:772-838)."""
    sdf = new_cpu_sdf3(shape)
    bb = shape.bounds()
    size = bb.size()
    center = bb.center()
    eps = 1e-4 * float(np.linalg.norm(size))
    # 26 neighboring shifted copies of the bounding box
    offs = [-1.0, 0.0, 1.0]
    for ox in offs:
        for oy in offs:
            for oz in offs:
                if ox == oy == oz == 0:
                    continue
                shift = np.array([ox, oy, oz], _f32) * (size + eps)
                shifted = bb.add(shift)
                pts = grid_points_3d(shifted, n)
                d = sdf.evaluate(pts)
                assert not np.any(np.isnan(d)), f"NaN outside bounds, offset {shift}"
                bad = d < 0
                assert not np.any(bad), (
                    f"negative distance {d[bad].min()} outside bounds at offset "
                    f"({ox},{oy},{oz}): {pts[bad][:3]}"
                )
                # central-difference normals at the offset box must not
                # point back toward the shape (reference fails at cos<=0,
                # gsdf_test.go:810-835); check the box-center sample
                cpt = shifted.center().astype(_f32)[None, :]
                nrm = normals_central_diff(sdf, cpt, eps)
                away = cpt[0] - center
                nn = float(np.linalg.norm(nrm[0])) * float(np.linalg.norm(away))
                if nn > 0:
                    cos = float(nrm[0] @ away) / nn
                    assert cos > 0, (
                        f"normal points toward the shape at offset "
                        f"({ox},{oy},{oz}): cos={cos}"
                    )


def assert_field_valid_3d(shape, n=10, scale=1.5, lipschitz_tol=1e-2):
    """NaN check + 1-Lipschitz check along grid traversal
    (reference fieldIsValid2, gsdf_test.go:887)."""
    sdf = new_cpu_sdf3(shape)
    pts = grid_points_3d(shape.bounds(), n, scale)
    d = sdf.evaluate(pts)
    assert not np.any(np.isnan(d)), "NaN in field"
    # successive points along the fastest axis
    dp = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    dd = np.abs(np.diff(d))
    mask = dp > 0
    viol = dd[mask] > dp[mask] * (1 + lipschitz_tol)
    assert not np.any(viol), (
        f"Lipschitz violation: |dd|={dd[mask][viol].max()} over |dp|="
        f"{dp[mask][viol].min()}"
    )


def assert_field_valid_2d(shape, n=24, scale=1.5, lipschitz_tol=1e-2):
    sdf = new_sdf2(shape)
    pts = grid_points_2d(shape.bounds(), n, scale)
    d = sdf.evaluate(pts)
    assert not np.any(np.isnan(d)), "NaN in 2D field"
    dp = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    dd = np.abs(np.diff(d))
    mask = dp > 0
    viol = dd[mask] > dp[mask] * (1 + lipschitz_tol)
    assert not np.any(viol)


def assert_bounds_valid_2d(shape, n=12):
    sdf = new_sdf2(shape)
    bb = shape.bounds()
    size = bb.size()
    eps = 1e-4 * float(np.linalg.norm(size))
    offs = [-1.0, 0.0, 1.0]
    for ox in offs:
        for oy in offs:
            if ox == oy == 0:
                continue
            shift = np.array([ox, oy], _f32) * (size + eps)
            pts = grid_points_2d(bb.add(shift), n)
            d = sdf.evaluate(pts)
            assert not np.any(np.isnan(d))
            assert not np.any(d < 0), (
                f"negative 2D distance outside bounds at offset ({ox},{oy})"
            )
