#!/usr/bin/env python3
"""Regenerate README.md's operator catalog from executed artifacts.

Sources (never hand-edited numbers):
  - <vout>/check_summary.json  written by tools/check.py after a full
    graft.Verify run: per-key oracle status (pass/exempt/fail) + rows
  - BENCH_FULL.json            written by graft.Bench (unfiltered run):
    per-key sf0.1 seconds

The two keysets must be IDENTICAL — a key benched but not verified (or
vice versa) is drift, and the generator refuses to write. Output goes
between the CATALOG:BEGIN/END markers in README.md.

Usage: python3 tools/gen_catalog.py [voutDir] [benchJson] [readme]
"""
import json, sys

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
bench_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_FULL.json"
readme_path = sys.argv[3] if len(sys.argv) > 3 else "README.md"

BEGIN, END = "<!-- CATALOG:BEGIN (tools/gen_catalog.py) -->", "<!-- CATALOG:END -->"

summary = json.load(open(f"{vout}/check_summary.json"))
bench = json.load(open(bench_path))
bq = bench["queries"]

sk, bk = set(summary), set(bq)
if sk != bk:
    missing_bench = sorted(sk - bk)
    missing_verify = sorted(bk - sk)
    sys.exit(f"keyset drift: verified-not-benched={missing_bench} "
             f"benched-not-verified={missing_verify}")

n_pass = sum(1 for v in summary.values() if v["status"] == "pass")
n_exempt = sum(1 for v in summary.values() if v["status"] == "exempt")
n_fail = sum(1 for v in summary.values() if v["status"] == "fail")
if n_fail:
    sys.exit(f"refusing to generate a catalog over {n_fail} FAILING keys")

GLYPH = {"pass": "oracle ✓", "exempt": "exempt –"}
lines = [
    BEGIN,
    "",
    f"**{len(summary)} query keys** — {n_pass} DuckDB-oracle hash-matched "
    f"at sf0.01, {n_exempt} oracle-exempt (ScalaTest-pinned), 0 failing; "
    f"sf0.1 bench total {bench['value']:.2f} s on local[32] "
    f"(min-of-{bench.get('runs_per_query', 3)} per query; machine-speed "
    f"calib_sec {float(bench.get('calib_sec', 'nan')):.3f}, series max "
    f"{max(float(c['sec']) for c in (bench.get('calib_series') or [{'sec': 'nan'}])):.3f}"
    f" — compare totals across rounds only after scaling by calib).",
    "",
    "| key | gate | rows@sf0.01 | sf0.1 s |",
    "|---|---|---:|---:|",
]
for k in sorted(summary):
    v = summary[k]
    lines.append(f"| {k} | {GLYPH[v['status']]} | {v['rows']} | {bq[k]:.3f} |")
lines += ["", END]

text = open(readme_path).read()
b, e = text.find(BEGIN), text.find(END)
if b < 0 or e < 0:
    sys.exit(f"markers not found in {readme_path}")
out = text[:b] + "\n".join(lines) + text[e + len(END):]
open(readme_path, "w").write(out)
print(f"catalog regenerated: {len(summary)} keys "
      f"({n_pass} pass, {n_exempt} exempt), bench {bench['value']:.2f}s")
