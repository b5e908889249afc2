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
