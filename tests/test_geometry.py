"""PolygonBuilder modifier resolution (geometry/polygon.py — the
rebuild of soypat/geometry ms2.PolygonBuilder used by the thread forms
and the gasket/plantpot examples)."""
import numpy as np
import pytest

from gsdf_tpu.geometry.polygon import PolygonBuilder


def _poly(verts_fn):
    pb = PolygonBuilder()
    verts_fn(pb)
    return pb.vertices()


def test_arc_on_first_vertex_equals_rotation():
    """An arc() on the FIRST vertex arcs the implicit closing segment
    (last -> first). The resolved ring must equal the same polygon built
    with the vertex order rotated so the arc lands mid-list (same cyclic
    vertex sequence) — regression: it used to be silently degraded to a
    plain corner."""
    r, facets = 0.4, 8

    def first(pb):
        pb.add_xy(1.0, -1.0).arc(r, facets)  # closing edge (0,-1)->(1,-1)
        pb.add_xy(1.0, 1.0)
        pb.add_xy(-1.0, 1.0)
        pb.add_xy(0.0, -1.0)

    def rotated(pb):
        pb.add_xy(1.0, 1.0)
        pb.add_xy(-1.0, 1.0)
        pb.add_xy(0.0, -1.0)
        pb.add_xy(1.0, -1.0).arc(r, facets)  # same edge, now in-list

    a = _poly(first)
    b = _poly(rotated)
    assert len(a) == len(b) == 4 + (facets - 1)
    # same cyclic ring: align b to a's first vertex and compare
    k = int(np.argmin(np.linalg.norm(b - a[0], axis=1)))
    np.testing.assert_allclose(np.roll(b, -k, axis=0), a, atol=1e-6)


def test_arc_first_vertex_adds_points():
    pb = PolygonBuilder()
    pb.add_xy(0.5, 0.0).arc(0.6, 6)
    pb.add_xy(0.0, 1.0)
    pb.add_xy(-0.5, 0.0)
    v = pb.vertices()
    assert len(v) == 3 + 5  # facets-1 intermediate points appended
    # intermediates belong to the closing segment: they come LAST
    mids = v[3:]
    chord = np.linalg.norm(np.array([0.5, 0.0]) - np.array([-0.5, 0.0]))
    for m in mids:
        assert np.linalg.norm(m - [-0.5, 0]) < chord + 0.6
        assert m[1] < 0.5  # bulge near the bottom edge, not the apex


def test_builder_needs_three_vertices():
    pb = PolygonBuilder()
    pb.add_xy(0, 0)
    pb.add_xy(1, 0)
    with pytest.raises(ValueError):
        pb.vertices()
