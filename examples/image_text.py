"""Text line -> PNG (reference examples/image-text/text.go:24-35)."""
from _common import example_args  # noqa: F401  (sets sys.path)

from gsdf_tpu import Builder
from gsdf_tpu.forge.textsdf import Font
from gsdf_tpu.pipeline import render_png_file_2d

FILENAME = "image-text.png"


def scene(bld: Builder):
    f = Font(builder=bld)
    f.load_default()
    return f.text_line("Hello world!")


if __name__ == "__main__":
    bld = Builder()
    img = render_png_file_2d(FILENAME, scene(bld), 1024, 256)
    print(f"wrote {FILENAME}")
