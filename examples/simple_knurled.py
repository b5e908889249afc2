"""Simple knurled cylinder via the chainable simplesdf API
(reference examples/simple-knurled-cylinder/simple-knurled.go; the
fogleman sdf python program the reference transcribes):

    f = rounded_cylinder(1, 0.1, 5)
    x = box((1, 1, 4)).rotate(pi / 4)
    x = x.circular_array(24, 1.6)
    x = x.twist(0.75) | x.twist(-0.75)
    f -= x.k(0.1)
    f -= cylinder(0.5).k(0.1)
"""
import math

from _common import example_args  # noqa: F401  (sets sys.path)

from gsdf_tpu import simplesdf as sdf

if __name__ == "__main__":
    args = example_args()
    f = sdf.cylinder(1, 5, 0.1)
    x = sdf.box(1, 1, 4, 0).rotate_z(math.pi / 4)
    x = x.translate(1.6, 0, 0).circ_array(24, 24)
    x = x.twist(0.75) | x.twist(-0.75)
    f = f.diff(x.k(0.1))
    f = f.diff(sdf.cylinder(0.5, 8).k(0.1))
    stats = f.save_stl(
        "simple-knurled.stl",
        sdf.STLConfig(resolution_divisions=args.resdiv, use_gpu=not args.cpu),
    )
    print(f"finished simple-knurled: {stats['triangles']} triangles")
