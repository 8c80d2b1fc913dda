"""Mechanics of the pure-math coverage gate (tools/coverage_gate.py,
VERDICT r4 #6).

The full gate (which re-runs seven test files under sys.monitoring and
enforces the 99% thresholds) runs as its own CI step — re-entering
pytest from inside pytest is how suites deadlock.  These tests pin the
measurement machinery itself: executable-line extraction, pragma and
docstring exclusion, and the one-shot LINE recording.
"""

import os
import sys
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import coverage_gate as cg


def test_executable_lines_excludes_docstrings_and_pragmas(tmp_path):
    src = textwrap.dedent('''\
        """Module docstring
        spanning lines."""
        X = 1


        def f(a):
            """f doc."""
            if a:  # pragma: no cover
                return 0
            return a + 1
        ''')
    p = tmp_path / "m.py"
    p.write_text(src)
    lines = cg.executable_lines(str(p))
    assert 3 in lines          # X = 1
    assert 6 in lines          # def f
    assert 10 in lines         # return a + 1
    assert 1 not in lines and 2 not in lines   # module docstring
    assert 7 not in lines      # function docstring
    assert 8 not in lines      # pragma: no cover
    assert 0 not in lines      # phantom module-preamble marker


def test_thresholds_cover_the_survey_pure_math_layer():
    """The gated set is the reference's coverage-gated shared layer
    (SURVEY §4 / doc/testing.md): the six pipeline pure-math modules
    plus every ops kernel, each gated at the reference's 99%."""
    gated = set(cg.THRESHOLDS)
    for rel in ("pipeline/geometry.py", "pipeline/gates.py",
                "pipeline/tracker.py", "pipeline/blendshape_input.py",
                "pipeline/types.py", "pipeline/config.py",
                "ops/anchors.py", "ops/detections.py",
                "ops/letterbox.py", "ops/warp.py", "ops/nms_pallas.py"):
        assert rel in gated, rel
    assert all(v >= 99.0 for v in cg.THRESHOLDS.values())
    # every gated file exists (a rename must update the gate)
    for abspath in cg.target_files():
        assert os.path.isfile(abspath), abspath


def test_line_monitoring_records_once(tmp_path):
    """The LINE callback records a (file, line) then DISABLEs it — the
    mechanism that makes the gate near-free in steady state."""
    from sys import monitoring as mon
    p = tmp_path / "probe_mod.py"
    p.write_text("def g(n):\n    total = 0\n    for i in range(n):\n"
                 "        total += i\n    return total\n")
    sys.path.insert(0, str(tmp_path))
    try:
        executed: dict[str, set[int]] = {}
        tool = mon.PROFILER_ID  # COVERAGE_ID may be claimed by the gate
        mon.use_tool_id(tool, "test-cov")
        target = str(p)

        def on_line(code, line):
            if code.co_filename == target:
                executed.setdefault(target, set()).add(line)
            return mon.DISABLE

        mon.register_callback(tool, mon.events.LINE, on_line)
        mon.set_events(tool, mon.events.LINE)
        try:
            import probe_mod
            assert probe_mod.g(5) == 10
        finally:
            mon.set_events(tool, 0)
            mon.register_callback(tool, mon.events.LINE, None)
            mon.free_tool_id(tool)
        hit = executed[target]
        exe = cg.executable_lines(target)
        assert hit == exe  # every executable line ran exactly once
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("probe_mod", None)
