"""Embedded-font determinism goldens (reference glyph_test.go:12-31).

The vendored ASCII DejaVu subset makes text geometry identical on every
host (the reference's embedded iso-3098.ttf plays the same role,
embed.go:8-16). These goldens lock the 'Abp8' test string the reference's
glyph test uses."""
import numpy as np

from gsdf_tpu import Builder
from gsdf_tpu.forge.textsdf import Font
from gsdf_tpu.render.flat import FlatRenderer


def _abp8():
    f = Font()
    f.load_default()
    return f.text_line("Abp8")


def test_embedded_font_present():
    from gsdf_tpu.forge.textsdf.font import EMBEDDED_FONT_PATH
    import os

    assert os.path.exists(EMBEDDED_FONT_PATH), (
        "vendored font missing — text output would depend on host fonts"
    )


def test_abp8_sdf_fingerprint():
    line = _abp8()
    bb = line.bounds()
    np.testing.assert_allclose(
        [bb.min[0], bb.min[1], bb.max[0], bb.max[1]],
        [0.00460829, -0.12269586, 1.4873272, 0.44815668],
        atol=1e-6,
    )
    xs = np.linspace(bb.min[0] - 0.1, bb.max[0] + 0.1, 96, dtype=np.float32)
    ys = np.linspace(bb.min[1] - 0.1, bb.max[1] + 0.1, 48, dtype=np.float32)
    P = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2).astype(np.float32)
    d = np.asarray(line.distance(P))
    assert int((d < 0).sum()) == 762  # inside-sample golden
    assert np.isfinite(d).all()


def test_abp8_extruded_triangle_golden():
    bld = Builder()
    ex = bld.extrude(_abp8(), 0.3)
    res = ex.bounds().diagonal() / 150
    tris = FlatRenderer(ex, res).render()
    assert len(tris) == 61700


def test_all_offcurve_contour():
    """TrueType contours with NO on-curve points (fontTools emits
    qCurveTo(..., None) with no preceding moveTo — common for circular
    dots in quadratic-outline fonts): the implied on-curve start is the
    midpoint of the LAST and FIRST off-curve points, never the previous
    contour's stale endpoint."""
    from gsdf_tpu.forge.textsdf.font import glyph_contours, signed_area

    class _Glyph:
        def draw(self, pen):
            # a "circle" of four off-curve points around the origin,
            # deliberately far from the (0,0) stale-prev anchor
            pen.value = [
                ("qCurveTo", ((10, 0), (0, 10), (-10, 0), (0, -10), None)),
                ("closePath", ()),
            ]

    # glyph_contours drives a RecordingPen; emulate draw() by writing
    # pen.value directly (RecordingPen stores (op, args) tuples)
    contours = glyph_contours({"dot": _Glyph()}, "dot", 1.0, 0.05)
    assert len(contours) == 1
    c = contours[0]
    r = np.linalg.norm(c, axis=1)
    # every flattened point lies in the annulus of the implied round
    # contour — in particular nowhere near the stale (0,0) anchor
    assert r.min() > 4.0, f"contour collapsed toward stale start: {r.min()}"
    assert r.max() < 10.5
    # closed, consistently wound, roughly centered
    assert abs(signed_area(c)) > 50
    assert np.abs(c.mean(axis=0)).max() < 1.0
