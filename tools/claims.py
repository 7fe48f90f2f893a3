#!/usr/bin/env python3
"""Prose-claim checker (VERDICT r11 ask #2: generate counts, don't
hand-maintain them).

Recomputes the facts the docs quote and greps README.md /
ARCHITECTURE.md / COVERAGE.md for stale numbers:

  - catalog entry count     <- parsed from src/main/scala/graft/queries/
  - sf1 scale-proof ratios  <- BENCH_sf1_full.json (per-key check of
                               every `NN.N x` the prose quotes for q64/q135)
  - test/suite counts       <- optional: path to an `sbt test` log
                               (checks README's quoted numbers match)

Usage: python3 tools/claims.py [sbt-test-log]
Exit 0 = all claims consistent; nonzero lists every drift.
"""
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
errors = []


def check(cond, msg):
    if not cond:
        errors.append(msg)


# ---- fact: catalog entry count ----
names = set()
for p in (ROOT / "src/main/scala/graft/queries").glob("*.scala"):
    names.update(re.findall(r'"(q\d+[a-z0-9_]*)"\s*->', p.read_text()))
entries = len(names)

readme = (ROOT / "README.md").read_text()
arch = (ROOT / "ARCHITECTURE.md").read_text()

check(f"{entries} catalog queries" in readme,
      f"README.md: expected '{entries} catalog queries'")
check(f"{entries}/{entries} green" in readme,
      f"README.md: expected '{entries}/{entries} green'")

# any "N queries as of round R" style count must equal the real count
for m in re.finditer(r"(\d+) queries as of round", arch):
    check(int(m.group(1)) == entries,
          f"ARCHITECTURE.md: '{m.group(0)}' != actual {entries}")

# ---- fact: the DRIVER gate (VERDICT r12 ask #3) ----
# while the newest CORRECTNESS_r*.json has ANY red row, every full
# "N/N green" claim in the prose must be QUALIFIED (name the gate it is
# true of — 'local' or 'driver' within the surrounding sentence); an
# unqualified blanket green claim contradicting the driver artifact is
# exactly the drift r11 and r12 both flagged.
corr_files = sorted(ROOT.glob("CORRECTNESS_r*.json"),
                    key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
if corr_files:
    rows = json.loads(corr_files[-1].read_text())
    if isinstance(rows, dict) and "results" in rows:
        rows = rows["results"]
    reds = [k for k, v in rows.items()
            if isinstance(v, dict) and not (v.get("rows_match")
            and v.get("schema_match") and v.get("hash_match"))]
    if reds:
        for doc_name, text in (("README.md", readme),
                               ("ARCHITECTURE.md", arch)):
            for m in re.finditer(r"(\d+)/(\d+) green", text):
                if m.group(1) != m.group(2):
                    continue  # partial claims state their own red count
                ctx = text[max(0, m.start() - 200):m.end() + 200].lower()
                check("local" in ctx or "driver" in ctx or "judge" in ctx,
                      f"{doc_name}: unqualified '{m.group(0)}' claim while "
                      f"{corr_files[-1].name} has red rows ({', '.join(reds)})"
                      " - say which gate it is true of")

# ---- fact: QUOTED driver-gate numbers (VERDICT r13 ask #4) ----
# every "driver gate rNN: G/T" (or "driver gate's latest run, rNN, was
# G/T") quote must match the corresponding CORRECTNESS_rNN.json — and
# a quote for a round OLDER than the newest artifact is itself drift.
def _gate_counts(path):
    rows = json.loads(path.read_text())
    if isinstance(rows, dict) and "results" in rows:
        rows = rows["results"]
    green = sum(1 for v in rows.values()
                if isinstance(v, dict) and v.get("rows_match")
                and v.get("schema_match") and v.get("hash_match"))
    total = sum(1 for v in rows.values() if isinstance(v, dict))
    return green, total

if corr_files:
    newest_round = int(re.search(r"r(\d+)", corr_files[-1].name).group(1))
    by_round = {int(re.search(r"r(\d+)", p.name).group(1)): p
                for p in corr_files}
    gate_quote = re.compile(
        r"driver gate(?:'s latest run)?[,:]?\s+r(\d+)[,:]?\s+(?:was\s+)?"
        r"(\d+)/(\d+)", re.IGNORECASE)
    for doc_name, text in (("README.md", readme), ("ARCHITECTURE.md", arch)):
        flat = re.sub(r"\s+", " ", text)
        for m in gate_quote.finditer(flat):
            rnd, g, t = int(m.group(1)), int(m.group(2)), int(m.group(3))
            if rnd not in by_round:
                continue
            ag, at = _gate_counts(by_round[rnd])
            check((g, t) == (ag, at),
                  f"{doc_name}: '{m.group(0)}' but CORRECTNESS_r{rnd} "
                  f"records {ag}/{at}")
        # the "latest run" phrasing must actually be the latest artifact
        for m in re.finditer(
                r"driver gate's latest run, r(\d+)", flat, re.IGNORECASE):
            check(int(m.group(1)) == newest_round,
                  f"{doc_name}: 'latest run, r{m.group(1)}' is stale - "
                  f"newest artifact is CORRECTNESS_r{newest_round}")

# ---- fact: sf1 scale-proof ratios ----
# the HEADLINE quote for each tail key must be the artifact's number
# (historical round-N numbers elsewhere in the narrative are fine, so
# this is a presence check, not an every-mention check)
sf1 = json.loads((ROOT / "BENCH_sf1_full.json").read_text())["queries"]
for key in ("q64_ngram_jaccard", "q135_embedding_neardup_lsh"):
    actual = sf1[key]["ratio"]
    want = f"{actual:.1f}×"
    check(f"{key} {want}" in arch.replace("\n  ", " "),
          f"ARCHITECTURE.md: headline '{key} {want}' "
          f"(BENCH_sf1_full.json) not found")

# ---- fact: test/suite counts (optional, from an sbt test log) ----
if len(sys.argv) > 1:
    log = Path(sys.argv[1]).read_text()
    m = re.search(r"Tests: succeeded (\d+), failed (\d+)", log)
    s = re.search(r"Suites: completed (\d+), aborted (\d+)", log)
    if m and s:
        tests, suites = int(m.group(1)), int(s.group(1))
        check(int(m.group(2)) == 0, f"test log records {m.group(2)} failures")
        check(f"{tests} tests / {suites} suites" in readme,
              f"README.md: expected '{tests} tests / {suites} suites'")

if errors:
    print("CLAIM DRIFT:")
    for e in errors:
        print(" -", e)
    sys.exit(1)
print(f"claims consistent: {entries} entries"
      + (", test counts checked" if len(sys.argv) > 1 else ""))
