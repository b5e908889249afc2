"""GLSL export tests (reference glbuild/glbuild_test.go:15-74 dedup tests +
structural validation in place of a GL compile)."""
import io
import re

import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.visual import emit_functions, node_name, write_shadertoy_visual

bld = Builder()


def _defined_names(src):
    return re.findall(r"float (\w+)\(vec[23] p\)", src)


def _called_names(src):
    calls = set(re.findall(r"\b(\w+_[0-9a-f]{10})\s*\(", src))
    return calls


def test_dedup_identical_primitives():
    """Identical shapes must emit exactly one declaration
    (reference glbuild_test.go:15-64)."""
    s1 = bld.new_sphere(0.5)
    s2 = bld.new_sphere(0.5)
    u = bld.union(s1, s2, bld.translate(bld.new_sphere(0.5), 1, 0, 0))
    src = emit_functions(u)
    defs = _defined_names(src)
    assert len(defs) == len(set(defs))
    sphere_defs = [d for d in defs if d.startswith("sphere")]
    assert len(sphere_defs) == 1


def test_all_references_resolve():
    from examples_import import flange_scene

    obj = flange_scene()
    src = emit_functions(obj)
    defs = set(_defined_names(src))
    for call in _called_names(src):
        assert call in defs, f"undefined function {call}"
    assert node_name(obj) in defs
    assert src.count("{") == src.count("}")


def test_every_node_type_emits():
    """Every node kind must have a GLSL emitter."""
    poly = bld.new_polygon([(0, 0), (1, 0), (0.5, 1)])
    shapes2 = [
        bld.new_circle(1),
        bld.new_line2d(0, 0, 1, 1, 0.1),
        bld.new_lines2d([[(0, 0), (1, 0)], [(1, 0), (1, 1)]], 0.1),
        bld.new_arc(1, 1.0, 0.1),
        bld.new_equilateral_triangle(1),
        bld.new_rectangle(1, 2),
        bld.new_hexagon(1),
        bld.new_octagon(1),
        bld.new_ellipse(1, 2),
        poly,
        bld.new_diamond2d(1, 2),
        bld.new_rounded_x(1, 0.2),
        bld.new_quadratic_bezier2d((0, 0), (1, 1), (2, 0), 0.1),
        bld.union2d(poly, bld.new_circle(2)),
        bld.difference2d(poly, bld.new_circle(0.2)),
        bld.intersection2d(poly, bld.new_circle(0.5)),
        bld.xor2d(poly, bld.new_circle(0.5)),
        bld.array2d(poly, 2, 2, 2, 2),
        bld.offset2d(poly, 0.1),
        bld.translate2d(poly, 1, 1),
        bld.rotate2d(poly, 0.3),
        bld.symmetry2d(poly, True, False),
        bld.annulus(poly, 0.1),
        bld.circular_array2d(bld.translate2d(poly, 2, 0), 4, 6),
        bld.scale2d(poly, 2),
        bld.translate_multi2d(poly, [(0, 0), (2, 2)]),
        bld.elongate2d(poly, 0.5, 0.5),
    ]
    s3 = bld.new_sphere(1)
    shapes3 = [
        s3,
        bld.new_box(1, 1, 1, 0.1),
        bld.new_cylinder(1, 2, 0),
        bld.new_cylinder(1, 2, 0.1),
        bld.new_hexagonal_prism(1, 2),
        bld.new_torus(2, 0.5),
        bld.new_box_frame(1, 1, 1, 0.1),
        bld.union(s3, bld.new_sphere(2)),
        bld.difference(s3, bld.new_sphere(0.5)),
        bld.intersection(s3, bld.new_box(1, 1, 1, 0)),
        bld.xor(s3, bld.new_sphere(0.7)),
        bld.smooth_union(0.1, s3, bld.new_sphere(2)),
        bld.smooth_difference(0.1, s3, bld.new_sphere(0.5)),
        bld.smooth_intersect(0.1, s3, bld.new_sphere(0.7)),
        bld.scale(s3, 2),
        bld.symmetry(s3, True, True, False),
        bld.transform(s3, np.eye(4)),
        bld.rotate(s3, 0.5, (1, 1, 0)),
        bld.translate(s3, 1, 2, 3),
        bld.offset(s3, -0.1),
        bld.array(s3, 3, 3, 3, 2, 2, 2),
        bld.elongate(s3, 1, 0, 0),
        bld.shell(s3, 0.1),
        bld.circular_array(bld.translate(s3, 3, 0, 0), 4, 8),
        bld.twist(bld.new_box(1, 1, 2, 0), 0.5),
        bld.extrude(poly, 2),
        bld.revolve(bld.translate2d(bld.new_circle(0.2), 1, 0), 0),
    ]
    for s in shapes2 + shapes3:
        src = emit_functions(s)
        assert node_name(s) in src
        assert src.count("{") == src.count("}")


def test_screw_emits():
    from gsdf_tpu.forge import threads

    scr = threads.screw(bld, 2.0, threads.ISO(d=3, p=0.5, ext=True))
    src = emit_functions(scr)
    assert "screwnode" in src


def test_shadertoy_visual():
    buf = io.StringIO()
    write_shadertoy_visual(buf, bld.new_sphere(1.0), with_bounds_frame=True)
    src = buf.getvalue()
    assert "mainImage" in src
    assert "sceneSDF" in src
    assert "boxframe" in src  # bounds debug frame included


def test_with_bounds_override():
    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.geometry import box3

    s = bld.new_sphere(1.0)
    o = with_bounds(s, box3(-2, -2, -2, 2, 2, 2))
    assert o.bounds().max[0] == 2
    assert o.tree_hash() != s.tree_hash()
    src = emit_functions(o)
    assert node_name(o) in src


def test_format_glsl():
    from gsdf_tpu.visual.glsl import format_glsl

    src = "float f(vec3 p) {\nif (x) {\nreturn 1.0;\n}\nreturn 0.0;\n}"
    out = format_glsl(src)
    lines = out.splitlines()
    assert lines[1].startswith("    if")
    assert lines[2].startswith("        return")
    assert lines[3] == "    }"
    assert lines[5] == "}"


def test_raymarch_device_aa_filter_bit_identical():
    """The on-device supersampling box filter must equal rendering at
    aa*W x aa*H and box-filtering the u8 image on host — the exact
    pre-round-3 host formulation floor(mean + 0.5) (same device, so the
    underlying samples are identical)."""
    import numpy as np

    from gsdf_tpu import Builder
    from gsdf_tpu.visual.raymarch import raymarch_image

    bld = Builder()
    s = bld.smooth_union(
        0.1, bld.new_sphere(0.7), bld.new_box(1.0, 0.6, 0.4, 0.05)
    )
    dev_aa = raymarch_image(s, 48, 40, aa=2, steps=40)
    full = raymarch_image(s, 96, 80, aa=1, steps=40)
    boxed = full.reshape(40, 2, 48, 2, 3).astype(np.uint16)
    ref = (boxed.mean(axis=(1, 3)) + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(dev_aa, ref)
