"""Import-rot guard: drive one example CLI end-to-end in fast mode."""

import importlib.util
import os
import sys


def test_poisson_example_cli(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "ex", os.path.join(os.path.dirname(__file__), "..", "examples",
                           "poisson_mms_2d.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    try:
        sys.argv = ["x", "--domain-size", "16", "--max-epochs", "5",
                    "--out-dir", str(tmp_path)]
        mod.main()
    finally:
        sys.argv = old
    runs = os.listdir(tmp_path / "poisson-mms-resmin" / "version_0")
    assert "metrics.csv" in runs and "u.vti" in runs
