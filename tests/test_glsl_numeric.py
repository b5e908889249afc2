"""Numeric validation of the GLSL export: the emitted shader text is
EXECUTED (via visual/glsl_eval's transpiler) and compared against
distance() point-by-point on bounds-sized point sets — the port of the
reference's central codegen test (gsdf_test.go:429-543: testShader3D
compiles the generated compute shader and compares against the CPU
oracle, tol 5e-3, for all primitives/ops incl. randomized unary ops).

The battery MUST cover every node type registered in visual/glsl.py's
_EMITTERS table — test_every_emitter_is_covered fails when an emitter
is added without a numeric gate here."""
import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.core.node import Shader2D, Shader3D
from gsdf_tpu.eval import new_cpu_sdf3, new_sdf2
from gsdf_tpu.visual.glsl import _EMITTERS
from gsdf_tpu.visual.glsl_eval import glsl_distance_fn

TOL = 5e-3  # the reference's cmpDist tolerance (gsdf_test.go:527)

bld = Builder()


def _poly_verts():
    ang = np.linspace(0, 2 * np.pi, 7)[:-1]
    r = np.where(np.arange(6) % 2 == 0, 0.8, 0.45)
    return np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)


def _battery():
    """(label, shader) pairs covering every emitter node type."""
    b = bld
    sph = b.new_sphere(0.6)
    box = b.new_box(0.9, 0.7, 0.5, 0.05)
    circ = b.new_circle(0.5)
    rect = b.new_rectangle(0.8, 0.5)
    hexa = b.new_hexagon(0.45)
    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.forge.threads import ISO
    from gsdf_tpu.forge.threads.core import screw
    from gsdf_tpu.geometry import Box

    rot = b.rotate(box, 0.6, (0.0, 0.0, 1.0))
    shapes = [
        # 3D primitives
        ("sphere", sph),
        ("box", box),
        ("box_sharp", b.new_box(0.8, 0.6, 0.9, 0.0)),
        ("box_frame", b.new_box_frame(0.9, 0.7, 0.5, 0.05)),
        ("torus", b.new_torus(0.6, 0.2)),
        ("cylinder_sharp", b.new_cylinder(0.4, 0.8, 0.0)),
        ("cylinder_round", b.new_cylinder(0.4, 0.8, 0.08)),
        ("hex_prism", b.new_hexagonal_prism(0.6, 0.5)),
        ("tri_prism", b.new_triangular_prism(0.6, 0.5)),
        # 3D operations
        ("union", b.union(sph, box)),
        ("union_nary", b.union(sph, box, b.new_torus(0.5, 0.1))),
        ("difference", b.difference(box, sph)),
        ("intersection", b.intersection(box, sph)),
        ("xor", b.xor(box, sph)),
        ("smooth_union", b.smooth_union(0.1, sph, box)),
        ("smooth_difference", b.smooth_difference(0.1, box, sph)),
        ("smooth_intersect", b.smooth_intersect(0.1, box, sph)),
        ("scale", b.scale(sph, 1.7)),
        ("symmetry", b.symmetry(b.translate(sph, 0.2, 0.3, 0.1), True, False, True)),
        ("transform", b.transform(sph, _mat4_rt())),
        ("rotate", rot),
        ("translate", b.translate(sph, 0.3, -0.2, 0.1)),
        ("offset", b.offset(box, -0.05)),
        ("array", b.array(sph, 1.4, 1.5, 1.6, 2, 2, 2)),
        ("elongate", b.elongate(sph, 0.4, 0.3, 0.2)),
        ("shell", b.shell(box, 0.08)),
        ("circular_array", b.circular_array(b.translate(sph, 1.5, 0, 0), 5, 8)),
        ("twist", b.twist(b.new_hexagonal_prism(0.5, 0.6), 0.7)),
        ("extrude", b.extrude(hexa, 0.6)),
        ("revolve", b.revolve(b.translate2d(circ, 1.2, 0.0), 0.3)),
        ("screw", screw(b, 1.0, ISO(3.0, 0.5, ext=True))),
        ("bounds3", with_bounds(sph, Box((-1, -1, -1), (1, 1, 1)))),
        # 2D primitives
        ("circle", circ),
        ("line2d", b.new_line2d(-0.4, -0.2, 0.5, 0.3, 0.1)),
        ("lines2d", b.new_lines2d(
            [[(-0.5, -0.5), (0.5, -0.3)], [(0.5, -0.3), (0.2, 0.6)]], 0.08)),
        ("arc", b.new_arc(0.5, 1.8, 0.1)),
        ("eq_triangle", b.new_equilateral_triangle(0.7)),
        ("rectangle", rect),
        ("hexagon", hexa),
        ("octagon", b.new_octagon(0.5)),
        ("ellipse", b.new_ellipse(0.7, 0.4)),
        ("polygon", b.new_polygon(_poly_verts())),
        ("diamond", b.new_diamond2d(0.8, 0.5)),
        ("rounded_x", b.new_rounded_x(0.8, 0.1)),
        ("bezier", b.new_quadratic_bezier2d(
            (-0.5, -0.3), (0.1, 0.8), (0.6, -0.2), 0.1)),
        # 2D operations
        ("union2d", b.union2d(circ, rect, hexa)),
        ("difference2d", b.difference2d(rect, circ)),
        ("intersection2d", b.intersection2d(rect, circ)),
        ("xor2d", b.xor2d(rect, circ)),
        ("array2d", b.array2d(circ, 1.3, 1.4, 2, 2)),
        ("offset2d", b.offset2d(rect, -0.05)),
        ("translate2d", b.translate2d(circ, 0.3, -0.2)),
        ("rotate2d", b.rotate2d(rect, 0.5)),
        ("symmetry2d", b.symmetry2d(b.translate2d(circ, 0.2, 0.3), True, True)),
        ("annulus", b.annulus(circ, 0.08)),
        ("circular_array2d",
         b.circular_array2d(b.translate2d(circ, 1.2, 0.0), 5, 7)),
        ("scale2d", b.scale2d(hexa, 1.6)),
        ("translate_multi2d", b.translate_multi2d(
            circ, [(0.6, 0.0), (-0.6, 0.2), (0.0, -0.7)])),
        ("elongate2d", b.elongate2d(circ, 0.5, 0.3)),
        ("bounds2", with_bounds(circ, Box((-1, -1), (1, 1)))),
    ]
    return shapes


def _mat4_rt():
    c, s = np.cos(0.4), np.sin(0.4)
    m = np.array(
        [
            [c, -s, 0, 0.2],
            [s, c, 0, -0.1],
            [0, 0, 1, 0.15],
            [0, 0, 0, 1],
        ],
        np.float32,
    )
    return m


def _points_for(s, rng):
    bb = s.bounds()
    lo = np.asarray(bb.min, np.float64)
    hi = np.asarray(bb.max, np.float64)
    dim = lo.shape[0]
    if dim == 3:
        axes = [np.linspace(lo[d], hi[d], 9) for d in range(3)]
        g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    else:
        axes = [np.linspace(lo[d], hi[d], 24) for d in range(2)]
        g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 2)
    r = rng.uniform(lo, hi, (400, dim))
    return np.concatenate([g, r]).astype(np.float32)


def _node_types(s):
    out = set()
    stack = [s]
    while stack:
        n = stack.pop()
        out.add(type(n))
        stack.extend(n.children())
    return out


@pytest.mark.parametrize("label,shape", _battery(), ids=lambda v: v if isinstance(v, str) else "")
def test_glsl_matches_distance(label, shape):
    rng = np.random.default_rng(hash(label) % (1 << 32))
    pts = _points_for(shape, rng)
    glsl_eval = glsl_distance_fn(shape)
    if isinstance(shape, Shader3D):
        ref = new_cpu_sdf3(shape).evaluate(pts)
    else:
        ref = new_sdf2(shape).evaluate(pts)
    got = glsl_eval(pts)
    err = np.abs(got - np.asarray(ref))
    assert err.max() < TOL, (
        f"{label}: GLSL text disagrees with distance() — max err "
        f"{err.max():.2e} at {pts[err.argmax()]}"
    )


def test_every_emitter_is_covered():
    """Every node type with a GLSL emitter appears in the numeric
    battery (adding an emitter without a gate here fails)."""
    covered = set()
    for _, s in _battery():
        covered |= _node_types(s)
    missing = {
        t.__name__ for t in _EMITTERS if t not in covered
    }
    assert not missing, f"emitters with no numeric gate: {sorted(missing)}"


def _random_unary(op, rng):
    """One randomized unary-op tree (reference randomizes each unary op's
    parameters 10x, gsdf_test.go:233-283, generators :572-730)."""
    b = bld
    base = (
        b.new_sphere(float(rng.uniform(0.3, 0.7)))
        if rng.uniform() < 0.5
        else b.new_box(*rng.uniform(0.4, 0.9, 3), 0.0)
    )
    prof = b.new_circle(float(rng.uniform(0.2, 0.5)))
    if op == "rotate":
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        return b.rotate(base, float(rng.uniform(-2.5, 2.5)), tuple(ax))
    if op == "shell":
        return b.shell(base, float(rng.uniform(0.02, 0.1)))
    if op == "elongate":
        return b.elongate(base, *rng.uniform(0.05, 0.5, 3))
    if op == "offset":
        return b.offset(base, float(rng.uniform(-0.1, 0.1)))
    if op == "scale":
        return b.scale(base, float(rng.uniform(0.5, 2.0)))
    if op == "symmetry":
        m = rng.uniform(size=3) < 0.5
        if not m.any():
            m[0] = True
        return b.symmetry(b.translate(base, 0.2, 0.1, -0.1), *map(bool, m))
    if op == "translate":
        return b.translate(base, *rng.uniform(-0.5, 0.5, 3))
    if op == "array":
        nx, ny, nz = (int(x) for x in rng.integers(1, 3, 3))
        return b.array(base, *rng.uniform(1.5, 2.0, 3), nx, ny, nz)
    if op == "circarray":
        n_total = int(rng.integers(3, 10))
        n_inst = int(rng.integers(2, n_total + 1))
        return b.circular_array(b.translate(base, 1.8, 0, 0), n_inst, n_total)
    if op == "twist":
        return b.twist(base, float(rng.uniform(-1.0, 1.0)))
    if op == "extrude":
        return b.extrude(prof, float(rng.uniform(0.3, 1.0)))
    if op == "revolve":
        return b.revolve(
            b.translate2d(prof, float(rng.uniform(0.8, 1.5)), 0.0),
            float(rng.uniform(0.0, 0.4)),
        )
    raise AssertionError(op)


_UNARY_OPS = [
    "rotate", "shell", "elongate", "offset", "scale", "symmetry",
    "translate", "array", "circarray", "twist", "extrude", "revolve",
]


@pytest.mark.parametrize("op", _UNARY_OPS)
def test_glsl_randomized_unary(op):
    """Randomized unary-op sweep: 3 seeded instances per op, GLSL text
    vs distance() (reference runs 10x per op at the same 5e-3 tol)."""
    for seed in range(3):
        rng = np.random.default_rng(hash((op, seed)) % (1 << 32))
        s = _random_unary(op, rng)
        pts = _points_for(s, rng)
        got = glsl_distance_fn(s)(pts)
        ref = new_cpu_sdf3(s).evaluate(pts)
        err = np.abs(got - np.asarray(ref))
        assert err.max() < TOL, (
            f"{op} seed {seed}: max err {err.max():.2e} "
            f"at {pts[err.argmax()]}"
        )


def test_gate_detects_perturbation():
    """Meta-test: a perturbed emitter body FAILS the comparison (the gate
    has teeth — matches the reference's intent that codegen errors are
    caught by execution, not by inspection)."""
    from gsdf_tpu.visual.glsl import emit_functions, node_name
    from gsdf_tpu.visual.glsl_eval import _V, transpile_glsl

    s = bld.new_sphere(0.6)
    src = emit_functions(s)
    bad = src.replace("length(p)-", "length(p)+")
    assert bad != src
    fn = transpile_glsl(bad)[node_name(s)]
    d = fn(_V([0.9, 0.0, 0.0]))
    ref = float(new_cpu_sdf3(s).evaluate(np.array([[0.9, 0, 0]], np.float32))[0])
    assert abs(d - ref) > TOL


from test_fuzz_paths import _random_tree, _seed_range  # noqa: E402


@pytest.mark.parametrize("seed", _seed_range(6))
def test_glsl_random_tree(seed):
    """Whole-random-tree codegen gate: the emitted GLSL for a COMPOSED
    CSG tree (the render-fuzz generator's full op set) executes to
    distance() within the reference tolerance. The per-shape battery
    above validates each emitter in isolation; this exercises emitter
    composition — nested function references, hash dedup of repeated
    subtrees, 2D->3D extrude/revolve hybrids — the way the reference's
    testShader3D compiles whole randomized shapes (gsdf_test.go:233-283).

    Widens with GSDF_TPU_FUZZ_SEEDS (marathon sweeps)."""
    rng = np.random.default_rng(500 + seed)
    t = _random_tree(rng)
    if t is None:
        pytest.skip("builder rejected random combination")
    bb = t.bounds()
    if not np.isfinite(bb.diagonal()) or bb.diagonal() <= 0:
        pytest.skip("degenerate bounds")
    pts = _points_for(t, rng)
    got = glsl_distance_fn(t)(pts)
    ref = np.asarray(new_cpu_sdf3(t).evaluate(pts))
    err = np.abs(got - ref)
    assert err.max() < TOL, (
        f"seed {seed}: max err {err.max():.2e} at {pts[err.argmax()]}"
    )
