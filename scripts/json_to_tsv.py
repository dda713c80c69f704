#!/usr/bin/env python3
"""Tabulate the per-read JSON metadata embedded in FASTA descriptions.

Equivalent of the reference's misc/json_to_tsv.py: scrappie_tpu (like
scrappie, ref src/scrappie_raw.c:317-325) writes read metrics as a JSON
object in each FASTA header; this turns them into one TSV for analysis.

Usage: json_to_tsv.py calls.fa [calls2.fa ...] > metrics.tsv
"""

from __future__ import annotations

import json
import sys


def records(paths):
    for path in paths:
        with open(path) as fh:
            for line in fh:
                if not line.startswith(">"):
                    continue
                name, _, rest = line[1:].partition("  ")
                rest = rest.strip()
                if not rest.startswith("{"):
                    continue
                try:
                    meta = json.loads(rest)
                except json.JSONDecodeError:
                    continue
                meta["read_name"] = name.strip()
                yield meta


def main(argv):
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    rows = list(records(argv[1:]))
    if not rows:
        print("no JSON metadata found", file=sys.stderr)
        return 1
    cols = ["read_name"] + sorted(k for k in rows[0] if k != "read_name")
    print("\t".join(cols))
    for r in rows:
        print("\t".join(str(r.get(c, "")) for c in cols))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
