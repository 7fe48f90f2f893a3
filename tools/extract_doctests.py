#!/usr/bin/env python3
"""Extract self-contained `cr>` doctest examples from the reference's
PUBLIC documentation (docs/general/builtins/*.rst) into a JSON corpus
the ScalarDocCorpusSpec replays through Engine.sql.

Self-contained = no FROM clause, or FROM over unnest/generate_series/
VALUES — examples querying the doctest fixture tables (locations,
summits, ...) are excluded. Expected cells are sliced by the ASCII
table's border columns, so cell text may contain pipes. The `...`
placeholder in a cell is preserved (the spec treats it as a wildcard).

Output: src/test/resources/doctests_builtins.json
  [{"file": ..., "line": N, "sql": ..., "cols": [...], "rows": [[...]]}]
"""
import json
import os
import re

REF = "/root/reference/docs/general/builtins"
FILES = [
    "scalar-functions.rst",
    "arithmetic.rst",
    "array-comparisons.rst",
    "bit-operators.rst",
    "comparison-operators.rst",
    "table-functions.rst",
]

SELF_CONTAINED_FROM = re.compile(
    r"from\s+(unnest|generate_series|generate_subscripts|regexp_matches|"
    r"pg_get_keywords|information_schema\._pg_expandarray|\(values)", re.I)


def split_cells(line, borders):
    # borders: list of '+' column indexes from the border line
    cells = []
    for a, b in zip(borders, borders[1:]):
        cells.append(line[a + 1:b].strip() if b <= len(line) else
                     line[a + 1:].strip())
    return cells


def extract(path):
    out = []
    lines = open(path, encoding="utf-8").read().split("\n")
    i = 0
    while i < len(lines):
        st = lines[i].strip()
        if st.startswith("cr>"):
            start_line = i + 1
            sql = [st[3:].strip()]
            j = i + 1
            while j < len(lines) and lines[j].strip().startswith("..."):
                sql.append(lines[j].strip()[3:].strip())
                j += 1
            stmt = " ".join(sql).rstrip(";").strip()
            # table block
            block = []
            while j < len(lines):
                t = lines[j].rstrip()
                ts = t.strip()
                if ts.startswith("+") or ts.startswith("|"):
                    block.append(ts)
                    j += 1
                elif "in set" in ts or ts.startswith("SELECT ") and "row" in ts:
                    j += 1
                    break
                else:
                    break
            i = j
            m = re.search(r"\bfrom\b", stmt, re.I)
            if m and not SELF_CONTAINED_FROM.search(stmt):
                continue
            if not block or not block[0].startswith("+"):
                continue
            borders = [k for k, c in enumerate(block[0]) if c == "+"]
            header = split_cells(block[1], borders)
            rows = []
            for b in block[3:]:
                if b.startswith("+"):
                    continue
                rows.append(split_cells(b, borders))
            out.append({
                "file": os.path.basename(path),
                "line": start_line,
                "sql": stmt,
                "cols": header,
                "rows": rows,
            })
        else:
            i += 1
    return out


def main():
    corpus = []
    for f in FILES:
        p = os.path.join(REF, f)
        if os.path.exists(p):
            corpus.extend(extract(p))
    dst = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "doctests_builtins.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w", encoding="utf-8") as fh:
        json.dump(corpus, fh, indent=1, ensure_ascii=False)
    print(f"{len(corpus)} examples -> {dst}")


if __name__ == "__main__":
    main()
