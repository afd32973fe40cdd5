"""Build the native extensions for jpeg2png_tpu.

    python setup.py build_ext --inplace
"""

from setuptools import Extension, setup

setup(
    name="jpeg2png_tpu",
    version="0.1.0",
    packages=[
        "jpeg2png_tpu",
        "jpeg2png_tpu.ops",
        "jpeg2png_tpu.models",
        "jpeg2png_tpu.kernels",
        "jpeg2png_tpu.parallel",
        "jpeg2png_tpu.io",
        "jpeg2png_tpu.utils",
    ],
    ext_modules=[
        Extension(
            "jpeg2png_tpu.io._jpegio",
            sources=["jpeg2png_tpu/native/jpegio.c"],
            libraries=["jpeg"],
            extra_compile_args=["-O2", "-Wall", "-Wextra"],
        ),
        Extension(
            "jpeg2png_tpu.io._pngio",
            sources=["jpeg2png_tpu/native/pngio.c"],
            libraries=["png"],
            extra_compile_args=["-O2", "-Wall", "-Wextra"],
        ),
    ],
)
