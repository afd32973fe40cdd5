"""Build the native extensions for jpeg2png_tpu.

    python setup.py build_ext --inplace
"""

from setuptools import Extension, setup

# project metadata and the console-script entry point live in
# pyproject.toml; this file only declares the C extensions
setup(
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
