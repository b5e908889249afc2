"""Numeric execution of the exported GLSL.

The reference's central codegen test does not trust the generated shader
text: it compiles it and compares every primitive/operation against the
CPU oracle point-by-point on a bounds-sized grid at 5e-3
(/root/reference/gsdf_test.go:429-543, cmpDist :527). Here the GLSL
export is a visualization/interop feature (XLA owns compute), but the
same discipline applies: a sign error in any emitter body in
visual/glsl.py must fail a test, not ship silently.

This module transpiles the GLSL subset the emitters use into Python and
evaluates it with a small float64 vec/mat runtime. The subset is exactly
what visual/glsl.py emits:

- types: float, int, vec2/3/4, mat2/3, bvec3, fixed-size arrays,
  `const` qualifiers
- statements: declarations (incl. multi-declarator), assignment and
  compound assignment (also to swizzles), if/else (braced or single
  statement), C-style for loops (incl. comma init/update and i++),
  return
- expressions: arithmetic, comparisons, || &&, swizzles, indexing,
  constructors, and the builtin calls length/dot/clamp/mix/abs/min/max/
  sign/atan/acos/cos/sin/sqrt/pow/floor/round/all/not

It is NOT a general GLSL implementation: anything outside the subset
raises, which is the correct behavior for a test oracle (a new emitter
construct must be added here consciously, with its semantics).
"""
from __future__ import annotations

import re
from typing import Callable, Dict, List, Tuple

import numpy as np

__all__ = ["transpile_glsl", "glsl_distance_fn", "transpile_glsl_source"]

# --- runtime -----------------------------------------------------------

_SWZ = {"x": 0, "y": 1, "z": 2, "w": 3}


class _V:
    """GLSL vecN value: a float64 component vector with swizzle
    get/set-attribute access (value semantics via .copy() at function
    entry, matching GLSL's by-value parameters)."""

    __slots__ = ("v",)

    def __init__(self, v):
        object.__setattr__(self, "v", np.asarray(v, np.float64).reshape(-1))

    def copy(self) -> "_V":
        return _V(self.v.copy())

    def __getattr__(self, name):
        if name and all(ch in _SWZ for ch in name):
            idx = [_SWZ[c] for c in name]
            if len(idx) == 1:
                return float(self.v[idx[0]])
            return _V(self.v[idx])
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if not (name and all(ch in _SWZ for ch in name)):
            raise AttributeError(name)
        idx = [_SWZ[c] for c in name]
        self.v[idx] = value.v if isinstance(value, _V) else value

    def _wrap(self, r):
        return _V(r)

    def __add__(self, o):
        return _V(self.v + (o.v if isinstance(o, _V) else o))

    __radd__ = __add__

    def __sub__(self, o):
        return _V(self.v - (o.v if isinstance(o, _V) else o))

    def __rsub__(self, o):
        return _V((o.v if isinstance(o, _V) else o) - self.v)

    def __mul__(self, o):
        return _V(self.v * (o.v if isinstance(o, _V) else o))

    __rmul__ = __mul__

    def __truediv__(self, o):
        return _V(self.v / (o.v if isinstance(o, _V) else o))

    def __rtruediv__(self, o):
        return _V((o.v if isinstance(o, _V) else o) / self.v)

    def __neg__(self):
        return _V(-self.v)

    def __repr__(self):
        return f"_V({self.v.tolist()})"


class _M:
    """GLSL matN (column-major constructor arguments)."""

    __slots__ = ("m",)

    def __init__(self, m):
        self.m = np.asarray(m, np.float64)

    def __mul__(self, o):
        if isinstance(o, _V):
            return _V(self.m @ o.v)
        raise TypeError("mat * non-vec")


def _vecn(n: int) -> Callable:
    def ctor(*args):
        out: List[float] = []
        for a in args:
            if isinstance(a, _V):
                out.extend(a.v.tolist())
            else:
                out.append(float(a))
        if len(out) == 1:
            out = out * n
        if len(out) != n:
            raise ValueError(f"vec{n} constructed from {len(out)} components")
        return _V(out)

    return ctor


def _mat2(*a):
    # column-major: mat2(c0r0, c0r1, c1r0, c1r1)
    return _M(np.array([[a[0], a[2]], [a[1], a[3]]], np.float64))


def _mat3(*a):
    if len(a) == 3 and isinstance(a[0], _V):
        return _M(np.stack([c.v for c in a], axis=1))
    return _M(np.array(a, np.float64).reshape(3, 3).T)


def _unwrap(x):
    return x.v if isinstance(x, _V) else x


def _rewrap(r):
    if isinstance(r, np.ndarray) and r.ndim:
        return _V(r)
    return float(r)


def _unary(f):
    def g(x):
        return _rewrap(f(_unwrap(x)))

    return g


def _binary(f):
    def g(a, b):
        return _rewrap(f(_unwrap(a), _unwrap(b)))

    return g


def _length(x):
    return float(np.linalg.norm(_unwrap(x)))


def _dot(a, b):
    return float(np.dot(_unwrap(a), _unwrap(b)))


def _clamp(x, lo, hi):
    return _rewrap(np.clip(_unwrap(x), _unwrap(lo), _unwrap(hi)))


def _mix(a, b, h):
    # GLSL mix(x, y, a) = x*(1-a) + y*a
    return _rewrap(_unwrap(a) * (1.0 - _unwrap(h)) + _unwrap(b) * _unwrap(h))


def _atan(y, x=None):
    if x is None:
        return _rewrap(np.arctan(_unwrap(y)))
    return _rewrap(np.arctan2(_unwrap(y), _unwrap(x)))


def _not(cond):
    return tuple(not bool(c) for c in cond)


def _bvec(*args):
    return tuple(bool(a) for a in args)


def _arr(*args):
    return list(args)


def _runtime() -> Dict:
    return {
        "__builtins__": {},
        "vec2": _vecn(2),
        "vec3": _vecn(3),
        "vec4": _vecn(4),
        "mat2": _mat2,
        "mat3": _mat3,
        "length": _length,
        "dot": _dot,
        "clamp": _clamp,
        "mix": _mix,
        "abs": _unary(np.abs),
        "sign": _unary(np.sign),
        "floor": _unary(np.floor),
        # GLSL round() ties are implementation-defined (np.round here is
        # half-even; the compute nodes use half-AWAY, ops3.py:23-26).
        # The only emitters using round() are Array/Array2D, where the
        # tie direction is immaterial: their 2-candidate neighborhood
        # scan evaluates {id, id+sign(p-s*id)} per axis, and at a tie
        # both roundings produce the SAME candidate set {n, n+1} — the
        # min over it is identical either way.
        "round": _unary(np.round),
        "sqrt": _unary(np.sqrt),
        "cos": _unary(np.cos),
        "sin": _unary(np.sin),
        "acos": _unary(np.arccos),
        "min": _binary(np.minimum),
        "max": _binary(np.maximum),
        "pow": _binary(np.power),
        "atan": _atan,
        "all": all,
        "not_": _not,
        "_bvec": _bvec,
        "_arr": _arr,
        "True": True,
        "False": False,
    }


# --- transpiler --------------------------------------------------------

_TYPE_WORDS = {
    "float", "int", "vec2", "vec3", "vec4", "mat2", "mat3",
    "bvec2", "bvec3", "bvec4",
}

_WORD_RE = re.compile(r"[A-Za-z_]\w*")


def _transpile_expr(e: str) -> str:
    e = e.strip()
    e = e.replace("||", " or ").replace("&&", " and ")
    e = re.sub(r"\bnot\s*\(", "not_(", e)
    e = re.sub(r"\bbvec[234]\s*\(", "_bvec(", e)
    e = re.sub(r"\bvec[234]\s*\[\s*\d+\s*\]\s*\(", "_arr(", e)
    return e


def _split_top(s: str, sep: str) -> List[str]:
    """Split on sep at paren/bracket depth 0."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _transpile_simple(stmt: str) -> List[str]:
    """One simple statement (no trailing ';') -> Python lines."""
    stmt = stmt.strip()
    if not stmt:
        return []
    if stmt.startswith("return"):
        return [f"return {_transpile_expr(stmt[len('return'):])}"]
    if stmt.startswith("const "):
        stmt = stmt[len("const "):].strip()
    m = _WORD_RE.match(stmt)
    if m and m.group(0) in _TYPE_WORDS:
        rest = stmt[m.end():].strip()
        out = []
        for decl in _split_top(rest, ","):
            decl = decl.strip()
            am = re.match(r"^(\w+)\s*\[\s*\d+\s*\]\s*=\s*(.*)$", decl, re.S)
            if am:
                out.append(f"{am.group(1)} = {_transpile_expr(am.group(2))}")
                continue
            dm = re.match(r"^(\w+)\s*=\s*(.*)$", decl, re.S)
            if dm:
                out.append(f"{dm.group(1)} = {_transpile_expr(dm.group(2))}")
            else:
                if not re.match(r"^\w+$", decl):
                    raise SyntaxError(f"unsupported declarator: {decl!r}")
                out.append(f"{decl} = 0.0")
        return out
    # assignment / compound assignment / increment
    im = re.match(r"^(\w+)\s*\+\+$", stmt)
    if im:
        return [f"{im.group(1)} += 1"]
    im = re.match(r"^(\w+)\s*--$", stmt)
    if im:
        return [f"{im.group(1)} -= 1"]
    am = re.match(r"^([\w.\[\]]+)\s*(=|\+=|-=|\*=|/=)\s*(.*)$", stmt, re.S)
    if am and not re.match(r"^=", am.group(3)):
        lhs, op, rhs = am.groups()
        return [f"{lhs} {op} {_transpile_expr(rhs)}"]
    raise SyntaxError(f"unsupported GLSL statement: {stmt!r}")


def _find_match(src: str, i: int, open_ch: str, close_ch: str) -> int:
    """Index just past the matching close for the opener at src[i]."""
    assert src[i] == open_ch
    depth = 0
    for j in range(i, len(src)):
        if src[j] == open_ch:
            depth += 1
        elif src[j] == close_ch:
            depth -= 1
            if depth == 0:
                return j + 1
    raise SyntaxError(f"unbalanced {open_ch}")


def _skip_ws(src: str, i: int) -> int:
    while i < len(src) and src[i].isspace():
        i += 1
    return i


def _parse_stmt_or_block(src: str, i: int, out: List[str], ind: str) -> int:
    """Parse one statement or braced block at src[i], appending Python
    lines at indent `ind`. Returns the next index."""
    i = _skip_ws(src, i)
    if i >= len(src):
        return i
    if src[i] == "{":
        end = _find_match(src, i, "{", "}")
        body = src[i + 1 : end - 1]
        if not _parse_stmts(body, out, ind):
            out.append(ind + "pass")
        return end

    m = _WORD_RE.match(src, i)
    word = m.group(0) if m else ""

    if word == "if":
        j = _skip_ws(src, m.end())
        cend = _find_match(src, j, "(", ")")
        cond = _transpile_expr(src[j + 1 : cend - 1])
        out.append(f"{ind}if {cond}:")
        sub: List[str] = []
        i = _parse_stmt_or_block(src, cend, sub, ind + "    ")
        out.extend(sub if sub else [ind + "    pass"])
        k = _skip_ws(src, i)
        em = _WORD_RE.match(src, k)
        if em and em.group(0) == "else":
            out.append(f"{ind}else:")
            sub = []
            i = _parse_stmt_or_block(src, em.end(), sub, ind + "    ")
            out.extend(sub if sub else [ind + "    pass"])
        return i

    if word == "for":
        j = _skip_ws(src, m.end())
        hend = _find_match(src, j, "(", ")")
        header = src[j + 1 : hend - 1]
        init_s, cond_s, update_s = _split_top(header, ";")
        for part in _transpile_simple(init_s):
            out.append(ind + part)
        out.append(f"{ind}while {_transpile_expr(cond_s)}:")
        body: List[str] = []
        i = _parse_stmt_or_block(src, hend, body, ind + "    ")
        out.extend(body if body else [ind + "    pass"])
        # GLSL comma operator evaluates left-to-right (e.g. `j=i, i++`)
        for upd in _split_top(update_s, ","):
            for part in _transpile_simple(upd):
                out.append(ind + "    " + part)
        return i

    # simple statement up to ';' at depth 0
    depth = 0
    j = i
    while j < len(src):
        if src[j] in "([":
            depth += 1
        elif src[j] in ")]":
            depth -= 1
        elif src[j] == ";" and depth == 0:
            break
        j += 1
    if j >= len(src):
        raise SyntaxError(f"missing ';' near: {src[i:i+60]!r}")
    for part in _transpile_simple(src[i:j]):
        out.append(ind + part)
    return j + 1


def _parse_stmts(src: str, out: List[str], ind: str) -> bool:
    i = 0
    emitted = len(out)
    while True:
        i = _skip_ws(src, i)
        if i >= len(src):
            break
        i = _parse_stmt_or_block(src, i, out, ind)
    return len(out) > emitted


_FN_RE = re.compile(r"float\s+(\w+)\s*\(\s*(vec[23])\s+(\w+)\s*\)\s*\{")


def transpile_glsl_source(src: str) -> str:
    """GLSL function declarations -> Python source (one def per GLSL
    function, same names, bodies transpiled)."""
    lines: List[str] = []
    pos = 0
    while True:
        m = _FN_RE.search(src, pos)
        if m is None:
            break
        name, _ptype, pname = m.group(1), m.group(2), m.group(3)
        body_end = _find_match(src, m.end() - 1, "{", "}")
        body = src[m.end() : body_end - 1]
        lines.append(f"def {name}({pname}):")
        # GLSL parameters are by-value: assignments to p must not leak
        lines.append(f"    {pname} = {pname}.copy()")
        if not _parse_stmts(body, lines, "    "):
            lines.append("    pass")
        lines.append("")
        pos = body_end
    return "\n".join(lines)


def transpile_glsl(src: str) -> Dict[str, Callable]:
    """Execute the transpiled source against the runtime; returns the
    namespace mapping every GLSL function name to a Python callable
    taking a _V point and returning a float."""
    ns = _runtime()
    exec(compile(transpile_glsl_source(src), "<glsl>", "exec"), ns)
    return ns


def glsl_distance_fn(root) -> Callable[[np.ndarray], np.ndarray]:
    """Emit the tree's GLSL, transpile it, and return a batch evaluator
    pts (N,dim) float32 -> (N,) float32 computed BY THE GLSL TEXT (the
    reference's testShader3D evaluates the compiled shader the same way,
    gsdf_test.go:429-543)."""
    from .glsl import emit_functions, node_name

    ns = transpile_glsl(emit_functions(root))
    fn = ns[node_name(root)]

    def evaluate(pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, np.float32)
        out = np.empty(len(pts), np.float64)
        for i, q in enumerate(pts):
            out[i] = fn(_V(q))
        return out.astype(np.float32)

    return evaluate
