"""Packaging sanity: the console script target stays importable.

The reference ships as a standalone binary (Makefile / Windows icon.rc
packaging rows in SURVEY.md); our distribution story is a pip package
whose ``jpeg2png-tpu`` command maps to ``jpeg2png_tpu.cli:main``.
"""

import importlib
import pathlib
import tomllib

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_console_script_target_resolves():
    data = tomllib.loads((REPO / "pyproject.toml").read_text())
    target = data["project"]["scripts"]["jpeg2png-tpu"]
    module_name, func_name = target.split(":")
    mod = importlib.import_module(module_name)
    assert callable(getattr(mod, func_name))


def test_packages_list_matches_tree():
    data = tomllib.loads((REPO / "pyproject.toml").read_text())
    declared = set(data["tool"]["setuptools"]["packages"])
    on_disk = {
        str(p.parent.relative_to(REPO)).replace("/", ".")
        for p in (REPO / "jpeg2png_tpu").rglob("__init__.py")
    }
    assert declared == on_disk
