"""Every example must run end-to-end (reference: examples/ are exercised in CI)."""

import importlib
import pathlib
import sys

import pytest

EXAMPLES = sorted(
    p.stem
    for p in (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, capsys):
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "examples"))
    try:
        mod = importlib.import_module(name)
        mod.main()
    finally:
        sys.path.pop(0)
    out = capsys.readouterr().out
    assert len(out) > 0
