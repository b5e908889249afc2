"""2D SDF -> PNG image (reference examples/image/image.go:17-40)."""
from _common import example_args  # noqa: F401  (sets sys.path)

from gsdf_tpu import Builder
from gsdf_tpu.pipeline import render_png_file_2d

DIM = 20
FILENAME = "image-example.png"


def scene(bld: Builder):
    s = bld.new_circle(DIM)
    poly = bld.new_polygon([(DIM, 0), (3 * DIM, DIM), (3 * DIM, -DIM)])
    s = bld.union2d(s, poly)
    err = bld.err()
    if err:
        raise err
    return s


if __name__ == "__main__":
    bld = Builder()
    img = render_png_file_2d(FILENAME, scene(bld), 512, 512)
    print(f"wrote {FILENAME} ({img.shape[1]}x{img.shape[0]})")
