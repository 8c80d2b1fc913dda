#!/usr/bin/env python
"""Line-coverage gate for the pure-math layer (VERDICT r4 #6).

The reference measures and GATES its shared pure-Dart layer at 99%
(`/root/reference/doc/testing.md:53-66`) — the one layer where a line
nobody executes is a line nobody can trust.  This repo's analog is the
pure-math surface: `pipeline/{geometry,gates,tracker,blendshape_input,
types,config,smoothing}.py` and `ops/` (anchors, decode, NMS, letterbox,
warp).  No third-party coverage tool ships in this image, so this gate
is self-contained on Python 3.12's ``sys.monitoring``:

- LINE events record each (file, line) once and then DISABLE that
  location — near-zero steady-state overhead, so the gated tests run at
  full speed;
- executable lines come from the compiled code objects' ``co_lines()``
  (recursively through nested functions/classes), minus docstring-only
  and ``pragma: no cover`` lines;
- per-file thresholds below FAIL the run (wired into CI and
  tests/test_coverage_gate.py).

Usage: ``python tools/coverage_gate.py [--report-only]``
"""

from __future__ import annotations

import argparse
import ast
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "face_detection_tflite_tpu")

#: file (repo-relative) -> minimum line coverage %.  The reference gates
#: its shared layer at 99% (doc/testing.md:53-66); measured here
#: 2026-08-19 on the gated test set below: 99.2-100% per file, 99.7%
#: total — so every file gates at the reference's 99%.
THRESHOLDS = {
    "pipeline/geometry.py": 99.0,
    "pipeline/gates.py": 99.0,
    "pipeline/tracker.py": 99.0,
    "pipeline/blendshape_input.py": 99.0,
    "pipeline/types.py": 99.0,
    "pipeline/config.py": 99.0,
    "pipeline/smoothing.py": 99.0,
    "ops/anchors.py": 99.0,
    "ops/detections.py": 99.0,
    "ops/letterbox.py": 99.0,
    "ops/warp.py": 99.0,
    "ops/nms_pallas.py": 99.0,
}

#: The test files that exercise the pure-math layer.  Kept explicit (not
#: the whole suite) so the gate runs in minutes; heavier integration
#: suites cover orchestration, which the reference deliberately does NOT
#: coverage-gate (doc/testing.md:60-66: orchestration 11%, informational).
GATED_TESTS = [
    "tests/test_shared.py",
    "tests/test_ops.py",
    "tests/test_nms_pallas.py",
    "tests/test_reference_tables.py",
    "tests/test_blendshape_golden.py",
    "tests/test_render_and_masks.py",
    "tests/test_crowd.py",
]


def target_files() -> dict[str, str]:
    """abs path -> repo-relative key for every gated file."""
    return {os.path.join(PKG, rel.replace("/", os.sep)): rel
            for rel in THRESHOLDS}


def executable_lines(path: str) -> set[int]:
    """Line numbers that can execute, from compiled code objects."""
    with open(path, encoding="utf-8") as fh:
        src = fh.read()
    code = compile(src, path, "exec")
    lines: set[int] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        for const in c.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
        for _start, _end, line in c.co_lines():
            # line 0 is CPython's phantom module-preamble marker (RESUME),
            # not a source line.
            if line:
                lines.add(line)
    src_lines = src.splitlines()
    # Exclusions: explicit pragmas, and docstring-expression lines (they
    # appear in co_lines for the module/class/function preamble but are
    # data, not logic).
    for i, text in enumerate(src_lines, 1):
        if "pragma: no cover" in text:
            lines.discard(i)
    tree = ast.parse(src)
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                              ast.AsyncFunctionDef))
                and body and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)):
            for ln in range(body[0].lineno, body[0].end_lineno + 1):
                lines.discard(ln)
    return lines


def run_gated_tests(executed: dict[str, set[int]]) -> int:
    """Runs the gated test files in-process under sys.monitoring."""
    from sys import monitoring as mon

    targets = target_files()
    tool = mon.COVERAGE_ID
    mon.use_tool_id(tool, "fdt-coverage-gate")

    def on_line(code, line):
        fn = code.co_filename
        rel = targets.get(fn)
        if rel is not None:
            executed.setdefault(rel, set()).add(line)
        return mon.DISABLE  # each location fires exactly once

    mon.register_callback(tool, mon.events.LINE, on_line)
    mon.set_events(tool, mon.events.LINE)
    try:
        import pytest
        rc = pytest.main(["-q", "-p", "no:cacheprovider",
                          *(os.path.join(REPO, t) for t in GATED_TESTS)])
    finally:
        mon.set_events(tool, 0)
        mon.register_callback(tool, mon.events.LINE, None)
        mon.free_tool_id(tool)
    return int(rc)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--report-only", action="store_true",
                    help="print per-file coverage without enforcing "
                         "thresholds")
    args = ap.parse_args()
    sys.path.insert(0, REPO)

    executed: dict[str, set[int]] = {}
    rc = run_gated_tests(executed)
    if rc != 0:
        print(f"coverage gate: gated tests FAILED (pytest rc={rc})",
              file=sys.stderr)
        return rc

    failures = []
    print(f"{'file':38s} {'lines':>7s} {'hit':>6s} {'cov%':>6s} "
          f"{'gate':>6s}")
    for abspath, rel in sorted(target_files().items()):
        exe = executable_lines(abspath)
        hit = executed.get(rel, set()) & exe
        pct = 100.0 * len(hit) / len(exe) if exe else 100.0
        gate = THRESHOLDS[rel]
        mark = "ok" if pct >= gate else "FAIL"
        print(f"{rel:38s} {len(exe):7d} {len(hit):6d} {pct:6.1f} "
              f"{gate:6.1f}  {mark}")
        if pct < gate and not args.report_only:
            missing = sorted(exe - hit)[:12]
            failures.append(f"{rel}: {pct:.1f}% < {gate:.1f}% "
                            f"(first missed lines: {missing})")
    total_exe = sum(len(executable_lines(p)) for p in target_files())
    total_hit = sum(len(executed.get(r, set()) & executable_lines(p))
                    for p, r in target_files().items())
    print(f"{'TOTAL':38s} {total_exe:7d} {total_hit:6d} "
          f"{100.0 * total_hit / total_exe:6.1f}")
    for f in failures:
        print(f"coverage gate FAIL: {f}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
