"""GLSL export: SDF tree -> self-contained GLSL distance functions and
shadertoy visualizer.

The reference's glbuild package IS its compute backend; here XLA owns
compute and GLSL emission survives purely as a visualization/interop
feature (shadertoy export, reference glbuild.Programmer.
WriteShaderToyVisualizerSDF3 glbuild.go:263, WriteSDFDecl glbuild.go:287).

Design notes vs the reference:
- Function names are `<kind>_<tree-hash-prefix>`: short, deterministic,
  collision-free. This replaces the reference's grow-then-shorten name
  machinery (AppendShaderName + ShortenNames3D, glbuild.go:400) outright.
- Deduplication falls out of naming: structurally identical subtrees share
  a hash, hence a name, hence one emitted function (the reference
  deduplicates by (nameHash, bodyHash), glbuild.go:362-393).
- Emission order is children-before-parents (post-order), the same
  dependency order the reference achieves by reverse-BFS (glbuild.go:299).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List

import numpy as np

from ..core import mathx as mx
from ..core import ops2, ops3, primitives2, primitives3
from ..core.node import Shader, Shader2D, Shader3D
from ..forge.threads.core import ScrewNode


def _f(x) -> str:
    """GLSL float literal."""
    v = float(np.float32(x))
    if math.isinf(v):
        return "1e38" if v > 0 else "-1e38"
    s = np.format_float_positional(np.float32(v), unique=True, trim="0")
    if "." not in s and "e" not in s and "E" not in s:
        s += ".0"
    return s


def _v2(v) -> str:
    return f"vec2({_f(v[0])},{_f(v[1])})"


def _v3(v) -> str:
    return f"vec3({_f(v[0])},{_f(v[1])},{_f(v[2])})"


def _mat3(m) -> str:
    # GLSL matN constructors are column-major
    cols = ",".join(_v3(m[:, c]) for c in range(3))
    return f"mat3({cols})"


def _mat2(m) -> str:
    return f"mat2({_f(m[0, 0])},{_f(m[1, 0])},{_f(m[0, 1])},{_f(m[1, 1])})"


def node_name(n: Shader) -> str:
    kind = type(n).__name__.lower()
    return f"{kind}_{n.tree_hash().hex()[:10]}"


# --- per-node body emitters ------------------------------------------
# Each returns the GLSL function body (without the signature) given the
# node and its children's function names.

_EMITTERS: Dict[type, Callable] = {}


def emits(cls):
    def deco(fn):
        _EMITTERS[cls] = fn
        return fn

    return deco


# 3D primitives ---------------------------------------------------------
@emits(primitives3.Sphere)
def _(n, c):
    return f"return length(p)-{_f(n.r)};"


@emits(primitives3.BoxShape)
def _(n, c):
    d = n.dims * 0.5
    return (
        f"vec3 q = abs(p)-{_v3(d)}+{_f(n.round)};\n"
        "return length(max(q,0.0))+min(max(q.x,max(q.y,q.z)),0.0)"
        f"-{_f(n.round)};"
    )


@emits(primitives3.BoxFrame)
def _(n, c):
    e, b = n._args()
    return f"""p = abs(p)-{_v3(b)};
vec3 q = abs(p+{_f(e)})-{_f(e)};
float n1 = length(max(vec3(p.x,q.y,q.z),0.0))+min(max(p.x,max(q.y,q.z)),0.0);
float n2 = length(max(vec3(q.x,p.y,q.z),0.0))+min(max(q.x,max(p.y,q.z)),0.0);
float n3 = length(max(vec3(q.x,q.y,p.z),0.0))+min(max(q.x,max(q.y,p.z)),0.0);
return min(n1,min(n2,n3));"""


@emits(primitives3.Torus)
def _(n, c):
    return (
        f"vec2 q = vec2(length(p.xy)-{_f(n.r_greater)}, p.z);\n"
        f"return length(q)-{_f(n.r_lesser)};"
    )


@emits(primitives3.Cylinder)
def _(n, c):
    r, h, rnd = n._args()
    if float(rnd) == 0:
        return f"""float dx = length(p.xy)-{_f(r)};
float dy = abs(p.z)-{_f(h)};
return min(0.0,max(dx,dy))+length(max(vec2(dx,dy),0.0));"""
    return f"""float dx = length(p.xy)-{_f(r)}+{_f(rnd)};
float dy = abs(p.z)-{_f(h)};
return min(max(dx,dy),0.0)+length(max(vec2(dx,dy),0.0))-{_f(rnd)};"""


@emits(primitives3.HexagonalPrism)
def _(n, c):
    return f"""const vec2 k = vec2({_f(-mx.TRIBISECT)},0.5);
p = abs(p);
float pm = min(dot(k,p.xy),0.0);
p.xy -= 2.0*pm*k;
float d1 = length(p.xy-vec2(clamp(p.x,{_f(-0.57735 * float(n.side))},{_f(0.57735 * float(n.side))}),{_f(n.side)}))*sign(p.y-{_f(n.side)});
float d2 = p.z-{_f(n.h)};
return min(max(d1,d2),0.0)+length(max(vec2(d1,d2),0.0));"""


from ..core import wrappers as _wrappers  # noqa: E402


@emits(_wrappers.BoundsOverride3)
def _(n, c):
    return f"return {c[0]}(p);"


@emits(_wrappers.BoundsOverride2)
def _(n, c):
    return f"return {c[0]}(p);"


def format_glsl(src: str, indent: str = "    ") -> str:
    """Pretty printer: re-indent GLSL by brace depth (reference
    glbuild.FormatShader, glbuild.go:1384)."""
    out = []
    depth = 0
    for raw in src.splitlines():
        line = raw.strip()
        if not line:
            out.append("")
            continue
        # closing braces at line start dedent before printing
        leading_closes = len(line) - len(line.lstrip("}"))
        print_depth = max(0, depth - leading_closes)
        out.append(indent * print_depth + line)
        depth = max(0, depth + line.count("{") - line.count("}"))
    return "\n".join(out)


# 3D operations ---------------------------------------------------------
@emits(ops3.OpUnion)
def _(n, c):
    lines = [f"float d = {c[0]}(p);"]
    for name in c[1:]:
        lines.append(f"d = min(d,{name}(p));")
    lines.append("return d;")
    return "\n".join(lines)


@emits(ops3.Difference)
def _(n, c):
    return f"return max({c[0]}(p),-{c[1]}(p));"


@emits(ops3.Intersection)
def _(n, c):
    return f"return max({c[0]}(p),{c[1]}(p));"


@emits(ops3.Xor)
def _(n, c):
    return (
        f"float a = {c[0]}(p);\nfloat b = {c[1]}(p);\n"
        "return max(min(a,b),-max(a,b));"
    )


@emits(ops3.SmoothUnion)
def _(n, c):
    return f"""float a = {c[0]}(p);
float b = {c[1]}(p);
float h = clamp(0.5+0.5*(b-a)/{_f(n.k)},0.0,1.0);
return mix(b,a,h)-{_f(n.k)}*h*(1.0-h);"""


@emits(ops3.SmoothDifference)
def _(n, c):
    return f"""float a = {c[0]}(p);
float b = {c[1]}(p);
float h = clamp(0.5-0.5*(b+a)/{_f(n.k)},0.0,1.0);
return mix(a,-b,h)+{_f(n.k)}*h*(1.0-h);"""


@emits(ops3.SmoothIntersect)
def _(n, c):
    return f"""float a = {c[0]}(p);
float b = {c[1]}(p);
float h = clamp(0.5-0.5*(b-a)/{_f(n.k)},0.0,1.0);
return mix(b,a,h)+{_f(n.k)}*h*(1.0-h);"""


@emits(ops3.Scale)
def _(n, c):
    return f"return {c[0]}(p/{_f(n.factor)})*{_f(n.factor)};"


@emits(ops3.Symmetry)
def _(n, c):
    axes = "".join(a for a, m in zip("xyz", (n.mx_, n.my_, n.mz_)) if m)
    return f"p.{axes} = abs(p.{axes});\nreturn {c[0]}(p);"


@emits(ops3.Transform)
def _(n, c):
    rot = _mat3(n.t_inv[:3, :3])
    tr = _v3(n.t_inv[:3, 3])
    return f"return {c[0]}({rot}*p+{tr});"


@emits(ops3.Translate)
def _(n, c):
    return f"return {c[0]}(p-{_v3(n.p_)});"


@emits(ops3.Offset)
def _(n, c):
    return f"return {c[0]}(p)+({_f(n.off)});"


@emits(ops3.Array)
def _(n, c):
    return f"""vec3 s = {_v3(n.d)};
vec3 nlim = vec3({_f(n.nx - 1)},{_f(n.ny - 1)},{_f(n.nz - 1)});
vec3 id = round(p/s);
vec3 o = sign(p-s*id);
float d = 1e20;
for (int k=0; k<2; k++)
for (int j=0; j<2; j++)
for (int i=0; i<2; i++) {{
  vec3 rid = clamp(id+vec3(i,j,k)*o, vec3(0.0), nlim);
  d = min(d, {c[0]}(p-s*rid));
}}
return d;"""


@emits(ops3.Elongate)
def _(n, c):
    return f"""vec3 q = abs(p)-{_v3(n.h * 0.5)};
return {c[0]}(max(q,0.0))+min(max(q.x,max(q.y,q.z)),0.0);"""


@emits(ops3.Shell)
def _(n, c):
    t = _f(n.thick)
    return f"return {t}*(abs({c[0]}(p/{t}))-{t});"


@emits(ops3.CircularArray)
def _(n, c):
    angle = 2 * math.pi / n.circle_div
    return f"""float angle = {_f(angle)};
float pangle = atan(p.y,p.x);
float id = floor(pangle/angle);
if (id < 0.0) id += {_f(n.circle_div)};
float i0, i1;
if (id >= {_f(n.n_inst - 1)}) {{ i0 = {_f(n.n_inst - 1)}; i1 = 0.0; }}
else {{ i0 = id; i1 = id+1.0; }}
float c0 = cos(angle*i0), s0 = sin(angle*i0);
float c1 = cos(angle*i1), s1 = sin(angle*i1);
float d0 = {c[0]}(vec3(c0*p.x+s0*p.y, -s0*p.x+c0*p.y, p.z));
float d1 = {c[0]}(vec3(c1*p.x+s1*p.y, -s1*p.x+c1*p.y, p.z));
return min(d0,d1);"""


@emits(ops3.Twist)
def _(n, c):
    return f"""float co = cos({_f(n.k)}*p.z);
float si = sin({_f(n.k)}*p.z);
return {c[0]}(vec3(co*p.x-si*p.y, si*p.x+co*p.y, p.z));"""


@emits(ops2.Extrusion)
def _(n, c):
    return f"""float d = {c[0]}(p.xy);
vec2 w = vec2(d, abs(p.z)-{_f(float(n.h) / 2)});
return min(max(w.x,w.y),0.0)+length(max(w,0.0));"""


@emits(ops2.Revolution)
def _(n, c):
    return f"return {c[0]}(vec2(length(p.xz)-{_f(n.off)}, p.y));"


@emits(ScrewNode)
def _(n, c):
    tan_taper = math.tan(float(n.taper))
    return f"""float y = length(p.xy) + p.z*{_f(tan_taper)};
float theta = atan(p.y,p.x);
float z = p.z + {_f(n.lead)}*theta/6.283185307179586;
float t = (z+{_f(float(n.pitch) / 2)})/{_f(n.pitch)};
float x = {_f(n.pitch)}*(t-floor(t))-{_f(float(n.pitch) / 2)};
float d2 = {c[0]}(vec2(x,y));
return max(d2, abs(p.z)-{_f(n.length_div2)});"""


# 2D primitives ---------------------------------------------------------
@emits(primitives2.Circle)
def _(n, c):
    return f"return length(p)-{_f(n.r)};"


@emits(primitives2.Line2D)
def _(n, c):
    ba = n.b - n.a
    return f"""vec2 pa = p-{_v2(n.a)};
vec2 ba = {_v2(ba)};
float h = clamp(dot(pa,ba)/{_f(np.dot(ba, ba))},0.0,1.0);
return length(pa-h*ba)-{_f(float(n.width) / 2)};"""


@emits(primitives2.Lines2D)
def _(n, c):
    segs = ",".join(
        f"vec4({_f(s[0, 0])},{_f(s[0, 1])},{_f(s[1, 0])},{_f(s[1, 1])})"
        for s in n.points
    )
    count = len(n.points)
    return f"""vec4 segs[{count}] = vec4[{count}]({segs});
float d2 = 1.0e23;
for (int i=0; i<{count}; i++) {{
  vec2 a = segs[i].xy;
  vec2 ba = segs[i].zw - a;
  vec2 pa = p - a;
  float h = clamp(dot(pa,ba)/dot(ba,ba),0.0,1.0);
  vec2 v = pa - h*ba;
  d2 = min(d2, dot(v,v));
}}
return sqrt(d2)-{_f(float(n.width) / 2)};"""


@emits(primitives2.Arc2D)
def _(n, c):
    s = math.sin(float(n.angle) / 2)
    co = math.cos(float(n.angle) / 2)
    return f"""p.x = abs(p.x);
vec2 sc = vec2({_f(s)},{_f(co)});
if (sc.y*p.x > sc.x*p.y) return length(p-sc*{_f(n.radius)})-{_f(float(n.thick) / 2)};
return abs(length(p)-{_f(n.radius)})-{_f(float(n.thick) / 2)};"""


@emits(primitives2.EquilateralTriangle)
def _(n, c):
    r = float(n.h_tri) / mx.SQRT3
    return f"""const float k = {_f(mx.SQRT3)};
p.x = abs(p.x)-{_f(r)};
p.y = p.y+{_f(r / mx.SQRT3)};
if (p.x+k*p.y > 0.0) p = vec2(p.x-k*p.y,-k*p.x-p.y)/2.0;
p.x -= clamp(p.x,{_f(-2 * r)},0.0);
return -length(p)*sign(p.y);"""


@emits(primitives2.Rectangle)
def _(n, c):
    return f"""vec2 d = abs(p)-{_v2(n.d * 0.5)};
return length(max(d,0.0))+min(max(d.x,d.y),0.0);"""


@emits(primitives2.Hexagon2D)
def _(n, c):
    r = float(n.side)
    return f"""const vec2 k = vec2({_f(-mx.TRIBISECT)},0.5);
p = abs(p);
p -= 2.0*min(dot(k,p),0.0)*k;
p -= vec2(clamp(p.x,{_f(-0.577350269 * r)},{_f(0.577350269 * r)}),{_f(r)});
return sign(p.y)*length(p);"""


@emits(primitives2.Octagon2D)
def _(n, c):
    r = float(n.c)
    return f"""const vec3 k = vec3(-0.9238795325,0.3826834323,0.4142135623);
p = abs(p);
p -= 2.0*min(dot(vec2(k.x,k.y),p),0.0)*vec2(k.x,k.y);
p -= 2.0*min(dot(vec2(-k.x,k.y),p),0.0)*vec2(-k.x,k.y);
p -= vec2(clamp(p.x,-k.z*{_f(r)},k.z*{_f(r)}),{_f(r)});
return sign(p.y)*length(p);"""


@emits(primitives2.Ellipse2D)
def _(n, c):
    return f"""float a = {_f(n.a)}, b = {_f(n.b)};
p = abs(p);
if (p.x > p.y) {{ p = p.yx; float tmp = a; a = b; b = tmp; }}
float l = b*b - a*a;
float m = a*p.x/l; float m2 = m*m;
float nn = b*p.y/l; float n2 = nn*nn;
float cc = (m2+n2-1.0)/3.0; float c3 = cc*cc*cc;
float q = c3 + 2.0*m2*n2;
float d = c3 + m2*n2;
float g = m + m*n2;
float co;
if (d < 0.0) {{
  float h = acos(clamp(q/c3,-1.0,1.0))/3.0;
  float s = cos(h), t = sin(h)*sqrt(3.0);
  float rx = sqrt(max(-cc*(s+t+2.0)+m2,0.0));
  float ry = sqrt(max(-cc*(s-t+2.0)+m2,0.0));
  co = (ry + sign(l)*rx + abs(g)/(rx*ry) - m)/2.0;
}} else {{
  float h = 2.0*m*nn*sqrt(d);
  float s = sign(q+h)*pow(abs(q+h),1.0/3.0);
  float u = sign(q-h)*pow(abs(q-h),1.0/3.0);
  float rx = -s-u-cc*4.0+2.0*m2;
  float ry = (s-u)*sqrt(3.0);
  float rm = sqrt(rx*rx+ry*ry);
  co = (ry/sqrt(rm-rx)+2.0*g/rm-m)/2.0;
}}
vec2 r = vec2(a*co, b*sqrt(max(1.0-co*co,0.0)));
return length(r-p)*sign(p.y-r.y);"""


@emits(primitives2.Polygon2D)
def _(n, c):
    verts = ",".join(_v2(v) for v in n.vert)
    count = len(n.vert)
    return f"""vec2 v[{count}] = vec2[{count}]({verts});
float d = dot(p-v[0],p-v[0]);
float s = 1.0;
for (int i=0, j={count - 1}; i<{count}; j=i, i++) {{
  vec2 e = v[j]-v[i];
  vec2 w = p-v[i];
  vec2 b = w - e*clamp(dot(w,e)/dot(e,e),0.0,1.0);
  d = min(d, dot(b,b));
  bvec3 cond = bvec3(p.y>=v[i].y, p.y<v[j].y, e.x*w.y>e.y*w.x);
  if (all(cond) || all(not(cond))) s = -s;
}}
return s*sqrt(d);"""


@emits(primitives2.Diamond2D)
def _(n, c):
    b = n.d * 0.5
    return f"""vec2 b = {_v2(b)};
p = abs(p);
float h = clamp((b.x*(b.x-2.0*p.x)-b.y*(b.y-2.0*p.y))/dot(b,b),-1.0,1.0);
float d = length(p-0.5*b*vec2(1.0-h,1.0+h));
return d*sign(p.x*b.y+p.y*b.x-b.x*b.y);"""


@emits(primitives2.RoundedX2D)
def _(n, c):
    return f"""p = abs(p);
float sub = 0.5*min(p.x+p.y,{_f(n.dim)});
return length(p-sub)-{_f(n.thick)};"""


@emits(primitives2.QuadraticBezier2D)
def _(n, c):
    A, B, C = n.a, n.b, n.c
    a = B - A
    b = A + C - 2 * B
    kk = 1.0 / float(np.dot(b, b))
    kx = kk * float(np.dot(a, b))
    return f"""vec2 A = {_v2(A)};
vec2 a = {_v2(a)};
vec2 b = {_v2(b)};
vec2 cc = 2.0*a;
float kk = {_f(kk)};
float kx = {_f(kx)};
vec2 d = A - p;
float ky = kk*(2.0*{_f(np.dot(a, a))}+dot(d,b))/3.0;
float kz = kk*dot(d,a);
float g = ky - kx*kx;
float q = kx*(2.0*kx*kx-3.0*ky)+kz;
float g3 = g*g*g;
float q2 = q*q;
float h = q2 + 4.0*g3;
float res;
if (h >= 0.0) {{
  h = sqrt(h);
  vec2 x = 0.5*(vec2(h,-h)-q);
  if (abs(g) < 0.001) {{
    float k = (1.0-g3/q2)*g3/q;
    x = vec2(k,-k-q);
  }}
  vec2 uv = sign(x)*pow(abs(x),vec2(1.0/3.0));
  float t = uv.x+uv.y;
  t -= (t*(t*t+3.0*g)+q)/(3.0*t*t+3.0*g);
  t = clamp(t-kx,0.0,1.0);
  vec2 w = d+(cc+b*t)*t;
  res = dot(w,w);
}} else {{
  float z = sqrt(-g);
  float m = cos(acos(q/(2.0*g*z))/3.0);
  float nn = sqrt(1.0-m*m)*sqrt(3.0);
  float tx = clamp((m+m)*z-kx,0.0,1.0);
  float ty = clamp((-nn-m)*z-kx,0.0,1.0);
  vec2 qx = d+(cc+b*tx)*tx;
  vec2 qy = d+(cc+b*ty)*ty;
  res = min(dot(qx,qx),dot(qy,qy));
}}
return sqrt(res)-{_f(float(n.thick) / 2)};"""


# 2D operations ---------------------------------------------------------
@emits(ops2.OpUnion2D)
def _(n, c):
    lines = [f"float d = {c[0]}(p);"]
    for name in c[1:]:
        lines.append(f"d = min(d,{name}(p));")
    lines.append("return d;")
    return "\n".join(lines)


@emits(ops2.Difference2D)
def _(n, c):
    return f"return max({c[0]}(p),-{c[1]}(p));"


@emits(ops2.Intersection2D)
def _(n, c):
    return f"return max({c[0]}(p),{c[1]}(p));"


@emits(ops2.Xor2D)
def _(n, c):
    return (
        f"float a = {c[0]}(p);\nfloat b = {c[1]}(p);\n"
        "return max(min(a,b),-max(a,b));"
    )


@emits(ops2.Array2D)
def _(n, c):
    return f"""vec2 s = {_v2(n.d)};
vec2 nlim = vec2({_f(n.nx - 1)},{_f(n.ny - 1)});
vec2 id = round(p/s);
vec2 o = sign(p-s*id);
float d = 1e20;
for (int j=0; j<2; j++)
for (int i=0; i<2; i++) {{
  vec2 rid = clamp(id+vec2(i,j)*o, vec2(0.0), nlim);
  d = min(d, {c[0]}(p-s*rid));
}}
return d;"""


@emits(ops2.Offset2D)
def _(n, c):
    return f"return {c[0]}(p)+({_f(n.f)});"


@emits(ops2.Translate2D)
def _(n, c):
    return f"return {c[0]}(p-{_v2(n.p_)});"


@emits(ops2.Rotation2D)
def _(n, c):
    return f"return {c[0]}({_mat2(n.t_inv)}*p);"


@emits(ops2.Symmetry2D)
def _(n, c):
    axes = "".join(a for a, m in zip("xy", (n.mx_, n.my_)) if m)
    return f"p.{axes} = abs(p.{axes});\nreturn {c[0]}(p);"


@emits(ops2.Annulus2D)
def _(n, c):
    return f"return abs({c[0]}(p))-{_f(n.r)};"


@emits(ops2.CircularArray2D)
def _(n, c):
    angle = 2 * math.pi / n.circle_div
    return f"""float angle = {_f(angle)};
float pangle = atan(p.y,p.x);
float id = floor(pangle/angle);
if (id < 0.0) id += {_f(n.circle_div)};
float i0, i1;
if (id >= {_f(n.n_inst - 1)}) {{ i0 = {_f(n.n_inst - 1)}; i1 = 0.0; }}
else {{ i0 = id; i1 = id+1.0; }}
float c0 = cos(angle*i0), s0 = sin(angle*i0);
float c1 = cos(angle*i1), s1 = sin(angle*i1);
float d0 = {c[0]}(vec2(c0*p.x+s0*p.y, -s0*p.x+c0*p.y));
float d1 = {c[0]}(vec2(c1*p.x+s1*p.y, -s1*p.x+c1*p.y));
return min(d0,d1);"""


@emits(ops2.Scale2D)
def _(n, c):
    return f"return {c[0]}(p/{_f(n.factor)})*{_f(n.factor)};"


@emits(ops2.TranslateMulti2D)
def _(n, c):
    count = len(n.displacements)
    verts = ",".join(_v2(v) for v in n.displacements)
    return f"""vec2 v[{count}] = vec2[{count}]({verts});
float d = 1.0e23;
for (int i=0; i<{count}; i++) d = min(d, {c[0]}(p-v[i]));
return d;"""


@emits(ops2.Elongate2D)
def _(n, c):
    return f"""vec2 q = abs(p)-{_v2(n.h * 0.5)};
return {c[0]}(max(q,0.0))+min(max(q.x,q.y),0.0);"""


# --- program assembly ------------------------------------------------

def emit_functions(root: Shader) -> str:
    """All GLSL distance functions of the tree, dependencies first, each
    structurally-unique subtree emitted exactly once."""
    seen: Dict[bytes, str] = {}
    out: List[str] = []

    def visit(n: Shader) -> str:
        h = n.tree_hash()
        if h in seen:
            return seen[h]
        child_names = [visit(ch) for ch in n.children()]
        name = node_name(n)
        seen[h] = name
        emitter = _EMITTERS.get(type(n))
        if emitter is None:
            raise NotImplementedError(
                f"no GLSL emitter for node type {type(n).__name__}"
            )
        body = emitter(n, child_names)
        ptype = "vec3" if isinstance(n, Shader3D) else "vec2"
        out.append(f"float {name}({ptype} p) {{\n{body}\n}}")
        return name

    visit(root)
    return "\n\n".join(out)


def write_sdf_decl(w, root: Shader) -> str:
    """Write the bare distance-function declarations (reference
    WriteSDFDecl, glbuild.go:287). Returns the root function name."""
    src = emit_functions(root)
    w.write(src)
    w.write("\n")
    return node_name(root)
