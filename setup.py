"""Thin setuptools shim. All metadata lives in pyproject.toml; this
file exists so environments whose setuptools predates a bundled wheel
builder (no `wheel` package installed, `error: invalid command
'bdist_wheel'`) can still install offline via the legacy path:

    pip install --no-use-pep517 --no-build-isolation --no-deps .

Modern tooling ignores this file and reads pyproject.toml directly.
The reference ships a setup.py for the same role (reference
setup.py:21-45); here it is deliberately empty of metadata so the two
never drift."""
from setuptools import setup

setup()
