"""GEB cover: tri-letter orthogonal intersection sculpture
(reference examples/ui-geb/uigeb.go:22-89). Renders to STL.
"""
import math

import numpy as np

from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.forge.textsdf import Font, FontConfig


def scaling_mat4(sx, sy, sz):
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = sx, sy, sz
    return m


def scene(bld: Builder):
    f = Font()
    f.configure(FontConfig(relative_glyph_tolerance=0.01, builder=bld))
    f.load_default()
    G = f.glyph("G")
    E = f.glyph("E")
    B = f.glyph("B")

    szG = G.bounds().size()
    szE = E.bounds().size()
    szB = B.bounds().size()

    # center letters
    G = bld.translate2d(G, -float(G.bounds().min[0]) - szG[0] / 2, -float(G.bounds().min[1]) - szG[1] / 2)
    E = bld.translate2d(E, -float(E.bounds().min[0]) - szE[0] / 2, -float(E.bounds().min[1]) - szE[1] / 2)
    B = bld.translate2d(B, -float(B.bounds().min[0]) - szB[0] / 2, -float(B.bounds().min[1]) - szB[1] / 2)
    round1 = 0.01
    G = bld.offset2d(G, -round1)
    E = bld.offset2d(E, -round1)
    B = bld.offset2d(B, -round1)

    szz = float(max(szG.max(), szE.max(), szB.max()))
    sclG = (szz / szG[0], szz / szG[1])
    sclE = (szz / szE[0], szz / szE[1])
    sclB = (szz / szB[0], szz / szB[1])

    L = szz
    G3 = bld.extrude(G, L)
    E3 = bld.extrude(E, L)
    B3 = bld.extrude(B, L)

    G3 = bld.transform(G3, scaling_mat4(sclG[0], sclG[1], 1))
    E3 = bld.transform(E3, scaling_mat4(sclE[0], sclE[1], 1))
    B3 = bld.transform(B3, scaling_mat4(sclB[0], sclB[1], 1))

    round2 = 0.025
    G3 = bld.offset(G3, -round2)
    E3 = bld.offset(E3, -round2)
    B3 = bld.offset(B3, -round2)

    deg90 = math.pi / 2
    GEB1 = bld.intersection(G3, bld.rotate(E3, deg90, (0, 1, 0)))
    GEB1 = bld.intersection(GEB1, bld.rotate(B3, -deg90, (1, 0, 0)))

    GEB2 = bld.intersection(E3, bld.rotate(G3, deg90, (0, 1, 0)))
    GEB2 = bld.intersection(GEB2, bld.rotate(B3, -deg90, (1, 0, 0)))

    GEB2 = bld.translate(GEB2, 0, float(GEB2.bounds().size()[1]) * 1.5, 0)

    shape = bld.union(GEB1, GEB2)
    shape = bld.scale(shape, 0.3)
    err = bld.err()
    if err:
        raise err
    return shape


if __name__ == "__main__":
    args = example_args(resdiv_default=300)
    bld = Builder()
    render_stl(scene(bld), "geb", args)
