"""Gate logic for flipping bench.py's default merge schedule.

scripts/pick_bench_default.py is the mechanical half of VERDICT r3 #3:
after scripts/acc_table.py regenerates docs/ACC_TABLE.md from the shipped
flagship export, the early-first-merge schedule becomes bench.py's
default iff its PVE row tracks the 5-site-max row.  These tests pin the
markdown-row parser and both gate outcomes against synthetic tables.
"""
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "pick_bench_default.py")


def _table(early_pve):
    return textwrap.dedent(f"""\
        # Operating-point accuracy on TRAINED weights

        | operating point | metric | PVE | MPJPE | PA-MPJPE | delta vs exact |
        |---|---|---|---|---|---|
        | exact bf16 | - | 100.00 | 90.00 | 60.00 | 0.00 |
        | int8 + 5-site max 4:80,10:48,16:24,20:16,26:8 | keys | 110.00 | 95.00 | 62.00 | 8.10 |
        | int8 + 5-site early 2:80,8:48,14:24,18:16,24:8 | keys | {early_pve:.2f} | 96.00 | 63.00 | 9.00 |
        """)


def _run(tmp_path, early_pve, extra=()):
    t = tmp_path / "table.md"
    t.write_text(_table(early_pve))
    return subprocess.run(
        [sys.executable, SCRIPT, "--table", str(t), "--dry-run", *extra],
        capture_output=True, text=True, cwd=REPO)


def test_gate_passes_within_budget(tmp_path):
    # budget = max(110*1.05, 111) = 115.5
    r = _run(tmp_path, 115.0)
    assert r.returncode == 0, r.stderr
    assert "PASS" in r.stdout
    assert "would set default" in r.stdout


def test_gate_fails_beyond_budget(tmp_path):
    r = _run(tmp_path, 116.5)
    assert r.returncode == 0, r.stderr
    assert "FAIL" in r.stdout
    assert "keeping current default" in r.stdout


def test_missing_row_is_fatal(tmp_path):
    t = tmp_path / "table.md"
    t.write_text("| exact bf16 | - | 1.0 | 1.0 | 1.0 | 0.0 |\n")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--table", str(t), "--dry-run"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 1
    assert "missing" in r.stderr


def test_real_flip_edits_bench_default(tmp_path):
    # run against a copy of the real bench.py so the edit site stays pinned
    t = tmp_path / "table.md"
    t.write_text(_table(110.5))
    bench_copy = tmp_path / "bench_copy.py"
    bench_copy.write_text(open(os.path.join(REPO, "bench.py")).read())
    r = subprocess.run(
        [sys.executable, SCRIPT, "--table", str(t), "--bench",
         str(bench_copy)],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    src = bench_copy.read_text()
    assert ('os.environ.get("BENCH_MERGE", "2:80,8:48,14:24,18:16,24:8")'
            in src)
    # idempotent second run: already-flipped default is accepted
    r2 = subprocess.run(
        [sys.executable, SCRIPT, "--table", str(t), "--bench",
         str(bench_copy)],
        capture_output=True, text=True, cwd=REPO)
    assert r2.returncode == 0
    assert "already defaults" in r2.stdout
