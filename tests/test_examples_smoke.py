"""Rot guard for EVERY example CLI: each script is executed end-to-end at a
tiny configuration, so an API drift in the library breaks CI instead of
silently rotting the example surface (VERDICT r1 item 5; counterpart of the
reference's Lightning fast_dev_run plumbing, IBN_2D.py:205,218)."""

import importlib.util
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def run_cli(script, argv):
    spec = importlib.util.spec_from_file_location(
        "ex_" + script.replace(".py", "").replace("-", "_"),
        os.path.join(EXAMPLES, script))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    try:
        sys.argv = ["x"] + [str(a) for a in argv]
        mod.main()
    finally:
        sys.argv = old


def test_poisson_example_cli(tmp_path):
    """Keeps the original artifact assertions for the flagship MMS CLI."""
    run_cli("poisson_mms_2d.py", ["--domain-size", 16, "--max-epochs", 5,
                                  "--out-dir", tmp_path])
    runs = os.listdir(tmp_path / "poisson-mms-resmin" / "version_0")
    assert "metrics.csv" in runs and "u.vti" in runs


@pytest.mark.parametrize("script,argv", [
    ("poisson_3d.py", ["--domain-size", 9, "--max-epochs", 3]),
    ("stokes_mms.py", ["--domain-size", 12, "--max-epochs", 3]),
    ("stokes_mms.py", ["--domain-size", 17, "--solver", "gmres"]),
    ("ns_ldc.py", ["--domain-size", 12, "--max-epochs", 3]),
    ("ns_ldc.py", ["--domain-size", 17, "--solver", "newton"]),
    ("eikonal_reconstruction.py", ["--domain-size", 16, "--max-epochs", 2]),
    ("eikonal_reconstruction.py", ["--domain-size", 16, "--solver", "gn"]),
    ("eikonal_reconstruction.py", ["--nsd", 3, "--domain-size", 9,
                                   "--max-epochs", 2]),
    ("poisson_ibn_parametric.py", ["-b", 4, "--n-samples", 8,
                                   "--max-epochs", 1, "--domain-size", 16]),
    # 16^3: the UNet3D downsampling stack needs >= 16 voxels per axis
    ("ibn_3d.py", ["--domain-size", 16, "--batch-size", 2, "--n-samples", 4,
                   "--max-epochs", 1]),
    # node count must divide the space axis for GSPMD spatial sharding
    ("multichip_scaling.py", ["--devices", 8, "--data", 4, "--space", 2,
                              "--domain-size", 16, "--batch-size", 4,
                              "--steps", 2]),
    # 32x64: the MultiOutUNet encoder needs >= 32 per axis
    ("ns_fpc_parametric.py", ["--max-epochs", 1, "--n-samples", 2,
                              "--batch-size", 2, "--width", 64,
                              "--height", 32, "--base-filters", 2]),
    ("eikonal_airfoil.py", ["--domain-size", 16, "--max-epochs", 2]),
    ("more_physics.py", ["helmholtz", "--domain-size", 17,
                         "--solver", "direct"]),
    ("more_physics.py", ["allen-cahn", "--domain-size", 17,
                         "--solver", "direct"]),
    ("sweep.py", ["--physics", "klsum", "--param", "n_train",
                  "--values", "4,8", "--domain-size", 16, "--max-epochs", 1,
                  "--batch-size", 4]),
], ids=lambda v: v if isinstance(v, str) else "")
def test_example_cli_smoke(tmp_path, script, argv):
    if "--out-dir" not in [str(a) for a in argv] and script != \
            "multichip_scaling.py":
        argv = list(argv) + ["--out-dir", tmp_path]
    run_cli(script, argv)


@pytest.mark.parametrize("physics", ["helmholtz", "advdiff", "allen-cahn",
                                     "burgers", "fsdt", "topopt"])
def test_more_physics_cli_smoke(tmp_path, physics):
    run_cli("more_physics.py", [physics, "--domain-size", 16,
                                "--max-epochs", 2, "--out-dir", tmp_path])
    assert os.path.isdir(tmp_path / physics / "version_0")


def test_ldc_validation_script_re1000(tmp_path):
    """Rot guard for the scripts/ surface at its most demanding setting:
    the Ghia Re=1000 Newton path (reaction-shifted preconditioner,
    unregularized lid, hardcoded Ghia table — no reference-mount
    dependence). Tiny 17^2 keeps it ~15 s (plumbing guard only — the
    Re=1000 physics assertion lives in test_flow.py, and the measured
    headline — 129^2: Ghia midline max errs u 0.0356 / v 0.0375 via
    33->65->129 grid continuation — in docs/SOLVERS.md)."""
    import importlib.util

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "ldc_validation.py")
    spec = importlib.util.spec_from_file_location("ldc_validation", script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "ghia.png")
    old = sys.argv
    try:
        sys.argv = ["x", "--re", "1000", "--solver", "newton",
                    "--domain-size", "17", "--out", out]
        mod.main()
    finally:
        sys.argv = old
    assert os.path.exists(out)


def test_klsum_uq_then_query_run_chain(tmp_path):
    """The train -> versioned-run-dir -> query pipeline (reference
    run-query.sh:20 + query.py:192-207 convention)."""
    run_cli("klsum_uq.py", ["--n-train", 8, "--n-query", 8, "--batch-size",
                            4, "--max-epochs", 1, "--domain-size", 16,
                            "--out-dir", tmp_path])
    run_dir = tmp_path / "klsum" / "version_0"
    assert (run_dir / "best.ckpt").exists()
    run_cli("query_run.py", [run_dir, "--domain-size", 16, "--n-query", 8,
                             "--batch-size", 4])
    assert (run_dir / "q_mean.npy").exists()
    assert (run_dir / "q_mean.vti").exists()
