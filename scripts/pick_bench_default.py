"""Gate-and-flip bench.py's default merge schedule on ACC_TABLE evidence.

VERDICT r3 #3: the early-first-merge schedule (2:80,8:48,14:24,18:16,24:8)
measured 2576 crops/s (1.29x north star) in the r3b sweep but was never
shipped because its accuracy row was missing from docs/ACC_TABLE.md.  This
script closes the loop mechanically after scripts/acc_table.py regenerates
the table from the shipped flagship export:

  gate: the early row's PVE (keys metric) must stay within
        max(5%, +1.0 mm) of the current-default 5-site-max row's PVE —
        i.e. the faster schedule costs ~nothing on task metrics, the same
        standard the r3 default was picked by (docs/PERF_NOTES.md).

If the gate passes, bench.py's BENCH_MERGE default is rewritten to the
early schedule (a one-constant edit) and the decision is printed; if it
fails, bench.py is left untouched and the reason is printed.  Run by
scripts/round4_post.sh stage 3; exit 0 either way (only table-parse
failures are fatal) so the pipeline continues.
"""
import argparse
import re
import sys

EARLY = "2:80,8:48,14:24,18:16,24:8"
CURRENT = "4:80,10:48,16:24,20:16,26:8"


def parse_rows(md_path):
    rows = {}
    for line in open(md_path):
        if not line.startswith("|") or line.startswith("|---"):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 6 or cells[2] in ("PVE", ""):
            continue
        try:
            rows[(cells[0], cells[1])] = {
                "pve": float(cells[2]), "mpjpe": float(cells[3]),
                "pa": float(cells[4]), "delta": float(cells[5])}
        except ValueError:
            continue
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--table", default="docs/ACC_TABLE.md")
    p.add_argument("--bench", default="bench.py")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()

    rows = parse_rows(args.table)
    cur = next((v for (n, m), v in rows.items()
                if "5-site max" in n and m == "keys"), None)
    early = next((v for (n, m), v in rows.items()
                  if "5-site early" in n and m == "keys"), None)
    if cur is None or early is None:
        print(f"FATAL: table rows missing (cur={cur}, early={early})",
              file=sys.stderr)
        return 1

    budget = max(cur["pve"] * 1.05, cur["pve"] + 1.0)
    ok = early["pve"] <= budget
    print(f"5-site max:   PVE {cur['pve']:.2f}  delta {cur['delta']:.2f} mm")
    print(f"5-site early: PVE {early['pve']:.2f}  delta {early['delta']:.2f} mm")
    print(f"gate: early PVE <= {budget:.2f} -> {'PASS' if ok else 'FAIL'}")
    if not ok:
        print("keeping current default", CURRENT)
        return 0
    if args.dry_run:
        print("dry-run: would set default to", EARLY)
        return 0

    src = open(args.bench).read()
    pat = f'os.environ.get("BENCH_MERGE", "{CURRENT}")'
    if pat not in src:
        if f'"{EARLY}"' in src:
            print("bench.py already defaults to the early schedule")
            return 0
        print("FATAL: bench.py default-schedule site not found", file=sys.stderr)
        return 1
    src = src.replace(pat, f'os.environ.get("BENCH_MERGE", "{EARLY}")')
    open(args.bench, "w").write(src)
    print(f"bench.py default -> {EARLY} (gated by {args.table})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
