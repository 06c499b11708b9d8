"""Packaging contract: the framework is installable and has real entry
points (the reference is a loose script tree — /root/reference/main.py
run from its checkout; a standalone framework must also work as an
installed package)."""

import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_python_dash_m_entry():
    # `python -m dgvcc_tpu --help` must exit 0 and show the task surface
    out = subprocess.run(
        [sys.executable, "-m", "dgvcc_tpu", "--help"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    for task in ("train", "test", "vis", "train_test", "serve", "quantize"):
        assert task in out.stdout


def test_console_script_target_is_callable():
    from dgvcc_tpu.cli.main import main
    assert callable(main)


def test_pyproject_declares_the_entry_point():
    import tomllib
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)
    assert proj["project"]["scripts"]["dgvcc-tpu"] == "dgvcc_tpu.cli.main:main"
    # runtime deps stay in sync with what the package actually imports
    deps = {d.split("[")[0].split(">")[0].split("=")[0].strip().lower()
            for d in proj["project"]["dependencies"]}
    assert {"jax", "flax", "optax", "numpy", "pillow", "pyyaml"} <= deps
    # torch is a test-only oracle, never a runtime dependency
    assert "torch" not in deps
    import dgvcc_tpu
    assert dgvcc_tpu.__version__ == proj["project"]["version"]
