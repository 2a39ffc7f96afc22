"""Every benchmark script imports and parses --help.

tools/hw_remeasure.py runs these unattended on TPU-relay recovery; an
import error or argparse bitrot in any of them would burn that one
unattended shot. This pins the cheap half: module import + --help exit 0
(no device work — conftest pins the CPU backend and nothing here traces).
"""

import importlib
import pathlib

import pytest

BENCH_DIR = pathlib.Path(__file__).parent.parent / "benchmarks"
MODULES = sorted(
    p.stem for p in BENCH_DIR.glob("bench_*.py")
)


@pytest.mark.parametrize("name", MODULES)
def test_benchmark_imports_and_help(name, capsys):
    mod = importlib.import_module(f"benchmarks.{name}")
    assert hasattr(mod, "main"), f"{name} has no main()"
    with pytest.raises(SystemExit) as exc:
        mod.main(["--help"])
    assert exc.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()


def test_bench_py_importable():
    # the driver metric script: import must not touch the backend (its
    # probe/compile work lives in main())
    import bench  # noqa: F401

    assert hasattr(bench, "main")
