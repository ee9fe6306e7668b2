"""HTML report generation from bulk-run JSONL logs.

Parity with the reference's XSLT pipeline (``performance_xml2html.xsl``
rendering PETSc ``-log_view ::ascii_xml`` output, SURVEY.md §2.6): turn
machine-readable run records into a browsable table.

Usage::

    python -m medane_tchakorom_ufc_thesis_repository_tpu.utils.report \
        bulk_runs.jsonl -o report.html
"""

from __future__ import annotations

import argparse
import html
import json
import sys
from typing import Dict, List

_COLUMNS = [
    ("alg", "algorithm"),
    ("backend", "backend"),
    ("grid", "grid"),
    ("rtol", "rtol"),
    ("converged", "conv"),
    ("sweeps", "sweeps"),
    ("cycles", "cycles"),
    ("inner_iters", "inner it"),
    ("elapsed_s", "solve s"),
    ("wall_s", "wall s"),
    ("rel_rnorm", "rel ‖r‖"),
    ("error_vs_ones", "err vs u=1"),
    ("error", "error"),
]


def render(records: List[Dict], title: str = "bulk run report") -> str:
    cols = [(k, label) for k, label in _COLUMNS
            if any(k in r for r in records)]
    rows = []
    for r in records:
        tds = []
        for k, _ in cols:
            v = r.get(k, "")
            if isinstance(v, float):
                v = f"{v:.3g}"
            tds.append(f"<td>{html.escape(str(v))}</td>")
        cls = "ok" if r.get("converged") else "bad"
        rows.append(f'<tr class="{cls}">{"".join(tds)}</tr>')
    head = "".join(f"<th>{html.escape(label)}</th>" for _, label in cols)
    return f"""<!doctype html>
<html><head><meta charset="utf-8"><title>{html.escape(title)}</title>
<style>
body {{ font: 14px system-ui, sans-serif; margin: 2em; }}
table {{ border-collapse: collapse; }}
th, td {{ border: 1px solid #ccc; padding: 4px 10px; text-align: right; }}
th {{ background: #f0f0f0; }}
tr.ok td:first-child {{ border-left: 4px solid #3a6; }}
tr.bad td:first-child {{ border-left: 4px solid #c33; }}
</style></head><body>
<h1>{html.escape(title)}</h1>
<p>{len(records)} runs, {sum(1 for r in records if r.get("converged"))} converged.</p>
<table><thead><tr>{head}</tr></thead><tbody>
{chr(10).join(rows)}
</tbody></table></body></html>
"""


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="report")
    p.add_argument("jsonl", help="bulk-run JSONL log")
    p.add_argument("-o", "--out", default="report.html")
    p.add_argument("--title", default="bulk run report")
    args = p.parse_args(argv)
    records = []
    with open(args.jsonl) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    with open(args.out, "w") as f:
        f.write(render(records, args.title))
    print(f"wrote {args.out} ({len(records)} runs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
