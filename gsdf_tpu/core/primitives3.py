"""3D primitives.

Numerical semantics transcribed from the reference oracle
(cpu_evaluators.go:20-105; constructors/bounds primitives.go:12-301).
Each node's `distance` maps jnp (...,3) -> (...,) float32.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..geometry.boxes import Box
from . import mathx as mx
from .node import Shader3D

_f32 = np.float32


class Sphere(Shader3D):
    """Sphere centered at origin (cpu_evaluators.go:20, primitives.go:28)."""

    PARAMS = ("r",)
    CONT_PARAMS = ("r",)

    def __init__(self, r: float):
        self.r = _f32(r)

    def distance(self, p):
        return mx.length(p) - self.r

    def bounds(self) -> Box:
        r = self.r
        return Box(np.array([-r, -r, -r], _f32), np.array([r, r, r], _f32))


class BoxShape(Shader3D):
    """Round-edged box (cpu_evaluators.go:28, primitives.go:65)."""

    PARAMS = ("dims", "round")
    CONT_PARAMS = ("dims", "round")

    def __init__(self, dims, round: float):
        self.dims = np.asarray(dims, dtype=_f32)
        self.round = _f32(round)

    def distance(self, p):
        d = jnp.asarray(self.dims * 0.5)
        q = jnp.abs(p) - d + self.round
        outside = mx.length(jnp.maximum(q, 0.0))
        inside = jnp.minimum(jnp.maximum(q[..., 0], jnp.maximum(q[..., 1], q[..., 2])), 0.0)
        return outside + inside - self.round

    def bounds(self) -> Box:
        return Box.centered(np.zeros(3, _f32), self.dims)


class BoxFrame(Shader3D):
    """Framed box of beam half-thickness e (cpu_evaluators.go:38, primitives.go:254)."""

    PARAMS = ("dims", "e")
    CONT_PARAMS = ("dims", "e")

    def __init__(self, dims, e: float):
        self.dims = np.asarray(dims, dtype=_f32)
        self.e = _f32(e)  # already halved by the builder

    def _args(self):
        # reference primitives.go:292-297
        e = self.e
        b = self.dims * _f32(0.5) - 2 * e
        return e, b

    def distance(self, p):
        e, b = self._args()
        p = jnp.abs(p) - jnp.asarray(b)
        q = jnp.abs(p + e) - e

        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
        qx, qy, qz = q[..., 0], q[..., 1], q[..., 2]

        def seg(a, b_, c):
            s = jnp.minimum(0.0, jnp.maximum(a, jnp.maximum(b_, c)))
            v = jnp.stack([jnp.maximum(a, 0.0), jnp.maximum(b_, 0.0), jnp.maximum(c, 0.0)], axis=-1)
            return mx.length(v) + s

        n1 = seg(px, qy, qz)
        n2 = seg(qx, py, qz)
        n3 = seg(qx, qy, pz)
        return jnp.minimum(n1, jnp.minimum(n2, n3))

    def bounds(self) -> Box:
        return Box.centered(np.zeros(3, _f32), self.dims)


class Torus(Shader3D):
    """Torus with axis in z (cpu_evaluators.go:59, primitives.go:216)."""

    PARAMS = ("r_lesser", "r_greater")
    CONT_PARAMS = ("r_lesser", "r_greater")

    def __init__(self, r_greater: float, r_lesser: float):
        self.r_greater = _f32(r_greater)
        self.r_lesser = _f32(r_lesser)

    def distance(self, p):
        # reference swizzles p.xzy then works in that frame; net effect below.
        qx = mx.hypot(p[..., 0], p[..., 1]) - self.r_greater
        return mx.hypot(qx, p[..., 2]) - self.r_lesser

    def bounds(self) -> Box:
        R = self.r_lesser + self.r_greater
        rl = self.r_lesser
        return Box(np.array([-R, -R, -rl], _f32), np.array([R, R, rl], _f32))


class Cylinder(Shader3D):
    """Cylinder with axis in z, optional edge rounding
    (cpu_evaluators.go:70, primitives.go:107)."""

    PARAMS = ("r", "h", "round")
    CONT_PARAMS = ("r", "h")

    def __init__(self, r: float, h: float, round: float):
        self.r = _f32(r)
        self.h = _f32(h)
        self.round = _f32(round)

    def _args(self):
        # reference primitives.go:147-149
        return self.r, (self.h - 2 * self.round) / _f32(2), self.round

    def distance(self, p):
        r, h, rnd = self._args()
        d_axis = mx.hypot(p[..., 0], p[..., 1])
        dy = jnp.abs(p[..., 2]) - h
        if rnd == 0:
            dx = d_axis - r
            return jnp.minimum(0.0, jnp.maximum(dx, dy)) + mx.hypot(
                jnp.maximum(dx, 0.0), jnp.maximum(dy, 0.0)
            )
        dx = d_axis - r + rnd
        return (
            jnp.minimum(jnp.maximum(dx, dy), 0.0)
            + mx.hypot(jnp.maximum(dx, 0.0), jnp.maximum(dy, 0.0))
            - rnd
        )

    def bounds(self) -> Box:
        r, h = self.r, self.h
        return Box(np.array([-r, -r, -h / 2], _f32), np.array([r, r, h / 2], _f32))


class HexagonalPrism(Shader3D):
    """Hexagonal prism, z axis; side = face-to-face HALF-dimension semantics
    follow the reference exactly (cpu_evaluators.go:90, primitives.go:157).
    Height spans [-h, h]."""

    PARAMS = ("side", "h")
    CONT_PARAMS = ("side", "h")

    def __init__(self, side: float, h: float):
        self.side = _f32(side)
        self.h = _f32(h)

    def distance(self, p):
        k1, k2, k3 = -mx.TRIBISECT, 0.5, 0.57735
        h1 = self.side
        h2 = self.h
        clm = _f32(k3) * h1
        p = jnp.abs(p)
        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
        pm = jnp.minimum(k1 * px + k2 * py, 0.0)
        px = px - 2 * k1 * pm
        py = py - 2 * k2 * pm
        d1 = mx.hypot(px - mx.clamp(px, -clm, clm), py - h1) * mx.sign(py - h1)
        d2 = pz - h2
        return jnp.minimum(jnp.maximum(d1, d2), 0.0) + mx.hypot(
            jnp.maximum(d1, 0.0), jnp.maximum(d2, 0.0)
        )

    def bounds(self) -> Box:
        l = float(self.side)
        lx = l / mx.TRIBISECT
        h = float(self.h)
        return Box(np.array([-lx, -l, -h], _f32), np.array([lx, l, h], _f32))


def make_bounds_box_frame(builder, bb: Box) -> Shader3D:
    """Debug helper enveloping a bounding box (reference primitives.go:12-21)."""
    size = bb.size()
    frame_thickness = _f32(size.max() / 256)
    size = size + 2 * frame_thickness
    bounding = builder.new_box_frame(size[0], size[1], size[2], frame_thickness)
    center = bb.center()
    return builder.translate(bounding, center[0], center[1], center[2])


class BuilderPrimitives3:
    """3D primitive constructors with reference validation rules."""

    def new_sphere(self, r: float) -> Shader3D:
        if not r > 0:
            self.shape_error("zero or negative sphere radius")
        return Sphere(r)

    def new_box(self, x: float, y: float, z: float, round: float = 0.0) -> Shader3D:
        if round < 0 or round > x / 2 or round > y / 2 or round > z / 2:
            self.shape_error("invalid box rounding value")
        if x <= 0 or y <= 0 or z <= 0:
            self.shape_error("zero or negative box dimension")
        return BoxShape((x, y, z), round)

    def new_cylinder(self, r: float, h: float, rounding: float = 0.0) -> Shader3D:
        if not (rounding >= 0 and rounding < r and rounding < h / 2):
            self.shape_error("invalid cylinder rounding")
        if not (r > 0 and h > 0):
            self.shape_error("bad cylinder dimension")
        return Cylinder(r, h, rounding)

    def new_hexagonal_prism(self, face2face: float, h: float) -> Shader3D:
        if face2face <= 0 or h <= 0:
            self.shape_error("invalid hexagonal prism parameter")
        return HexagonalPrism(face2face, h)

    def new_triangular_prism(self, tri_height: float, extrude_length: float) -> Shader3D:
        if not (extrude_length > 0 and not math.isinf(extrude_length)):
            self.shape_error("bad triangular prism extrude length")
        tri = self.new_equilateral_triangle(tri_height)
        return self.extrude(tri, extrude_length)

    def new_torus(self, greater_radius: float, lesser_radius: float) -> Shader3D:
        if greater_radius < 2 * lesser_radius:
            self.shape_error("too large torus lesser radius")
        if greater_radius <= 0 or lesser_radius <= 0:
            self.shape_error("invalid torus parameter")
        return Torus(greater_radius, lesser_radius)

    def new_box_frame(self, dim_x: float, dim_y: float, dim_z: float, e: float) -> Shader3D:
        e = e / 2
        if dim_x <= 0 or dim_y <= 0 or dim_z <= 0 or e <= 0:
            self.shape_error("negative or zero BoxFrame dimension")
        if 2 * e > min(dim_x, dim_y, dim_z):
            self.shape_error("BoxFrame edge thickness too large")
        return BoxFrame((dim_x, dim_y, dim_z), e)

    def new_bounds_box_frame(self, bb: Box) -> Shader3D:
        return make_bounds_box_frame(self, bb)
