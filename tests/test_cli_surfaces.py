"""Every jobs/ CLI must start as a real subprocess (``python jobs/<x>.py``).

Regression for a class of bug pytest imports cannot catch: running a script
puts its own directory at sys.path[0], so a module in jobs/ that shares a
stdlib name shadows it for every OTHER jobs CLI too (jobs/profile.py shadowed
stdlib ``profile``, crashing pyspark's cProfile import in all of them).
--help exercises the import chain + argparse wiring without a Spark session.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CLIS = sorted(glob.glob(os.path.join(_ROOT, "jobs", "*.py")))


@pytest.mark.parametrize("cli", _CLIS, ids=[os.path.basename(c) for c in _CLIS])
def test_cli_help_starts(cli):
    out = subprocess.run(
        [sys.executable, cli, "--help"],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "usage" in out.stdout.lower()


def test_no_stdlib_shadowing_in_jobs():
    """No jobs/ module may share a name with a stdlib module importable from
    a script's sys.path[0]."""
    import sys as _sys

    stdlib = set(_sys.stdlib_module_names)
    names = {os.path.splitext(os.path.basename(c))[0] for c in _CLIS}
    clashes = names & stdlib
    assert not clashes, f"jobs/ modules shadow stdlib: {clashes}"
