"""Lint gate (VERDICT r3 weak #4: no lint ran in CI, so a missing
``typing`` import survived behind ``from __future__ import annotations``).

Runs ``tools/lint.py`` — unused-import AST check over the whole tree plus
runtime resolution of every package annotation via
``typing.get_type_hints`` (the check that catches the serving.py:89
``Optional`` bug class).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lint_clean():
    env = dict(os.environ)
    # Module imports alone never initialize the JAX backend, but keep the
    # child deterministic on CI runners anyway.
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lint.py")],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env)
    assert proc.returncode == 0, (
        f"lint findings:\n{proc.stderr}\n{proc.stdout}")
