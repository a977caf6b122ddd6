#!/usr/bin/env python3
"""Regenerate docs/OPERATORS.md — the operator → file:line index.

Scans src/main/scala for `"<name>" -> { (s, d) =>` query entries and
emits one table per family, so a reader can find any operator without
grep. Run after adding operators:  python3 tools/gen_operator_index.py
"""
import os, re, collections

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src", "main", "scala")
PAT = re.compile(r'"((?:q|ev|tx|pk|dd|ss|mm)\d+_[a-z0-9_]+)"\s*->\s*[{(]')
# Strong anchor = the queries-map lambda STRUCTURE `-> { (a, b) =>`
# (any parameter spelling), not the literal "(s, d) =>" — a map entry
# with different parameter names silently downgraded to a weak match
# and could index the oracle SQL line instead (ADVICE r8).
LAMBDA = re.compile(r'->\s*\{?\s*\(\s*\w+\s*,\s*\w+\s*\)\s*=>')

FAMILIES = [
    ("ev", "Event pipeline"), ("q", "Core analytics"),
    ("tx", "Text analysis"), ("pk", "Packing/chunking"),
    ("dd", "Deduplication"), ("ss", "Similarity search"),
    ("mm", "Multimodal"),
]

TITLE = re.compile(r"//\s*---\s*(?:q|ev|tx|pk|dd|ss|mm)\d+:\s*(.+?)\s*-*\s*$")

found = {}
titles = {}
for dirpath, _, files in os.walk(SRC):
    for fn in sorted(files):
        if not fn.endswith(".scala"):
            continue
        path = os.path.join(dirpath, fn)
        rel = os.path.relpath(path, ROOT)
        pending_title = None
        last_comment = None
        for i, line in enumerate(open(path), 1):
            t = TITLE.search(line)
            if t:
                pending_title = t.group(1)
            else:
                c = re.match(r"\s*//\s*(.+)", line)
                if c and "---" not in c.group(1):
                    # first line of a plain comment block wins
                    if last_comment is None:
                        last_comment = c.group(1).strip()
                elif line.strip() and "//" not in line:
                    if PAT.search(line) is None:
                        last_comment = None
            for m in PAT.finditer(line):
                # Anchor on the queries-map form `-> { (s, d) =>`:
                # an oracle-first file would otherwise index the DuckDB
                # SQL line as the operator's location. A weak (non-
                # lambda) match only fills in when no strong match ever
                # appears for the name.
                strong = LAMBDA.search(line) is not None
                name = m.group(1)
                if strong and not found.get(name, (False, ""))[0]:
                    found[name] = (True, f"{rel}:{i}")
                    title = pending_title or last_comment or ""
                    titles[name] = title[:90].replace("|", "\\|")
                elif name not in found:
                    found[name] = (False, f"{rel}:{i}")
                    title = pending_title or last_comment or ""
                    titles[name] = title[:90].replace("|", "\\|")
                pending_title = None
                last_comment = None

def fam_of(name):
    return re.match(r"[a-z]+", name).group(0)

def num_of(name):
    return int(re.search(r"\d+", name).group(0))

by_fam = collections.defaultdict(list)
for name, (_, loc) in found.items():
    by_fam[fam_of(name)].append((num_of(name), name, loc))

out = ["# Operator index (generated — tools/gen_operator_index.py)",
       "",
       f"{len(found)} query operators. Regenerate after adding one.",
       ""]
for fam, title in FAMILIES:
    ops = sorted(by_fam.get(fam, []))
    out.append(f"## {title} ({len(ops)})")
    out.append("")
    out.append("| operator | what | where |")
    out.append("| --- | --- | --- |")
    for _, name, loc in ops:
        out.append(f"| {name} | {titles.get(name, '')} | {loc} |")
    out.append("")

import sys
target = os.path.join(ROOT, "docs", "OPERATORS.md")
content = "\n".join(out)
if "--check" in sys.argv:
    # gate mode (VERDICT r10 #4): exit 1 if the committed index has
    # drifted from the sources, same discipline as ShuffleBudgetSpec
    committed = open(target).read() if os.path.exists(target) else ""
    if committed != content:
        import difflib
        diff = list(difflib.unified_diff(
            committed.splitlines(), content.splitlines(),
            "committed", "regenerated", lineterm=""))
        print("\n".join(diff[:40]))
        print(f"docs/OPERATORS.md is stale ({len(diff)} diff lines) — "
              "regenerate: python3 tools/gen_operator_index.py")
        sys.exit(1)
    print(f"docs/OPERATORS.md is current ({len(found)} operators)")
else:
    with open(target, "w") as f:
        f.write(content)
    print(f"wrote docs/OPERATORS.md with {len(found)} operators")
