"""Data-docs renderer: browsable HTML from validation results.

The reference publishes every checkpoint run as a Great Expectations
data-docs site (``great_expectations/checkpoints/staging_checkpoint
.yml:9-20`` lists the ``update_data_docs`` action; site config at
``great_expectations.yml:101-123``).  The engine analogue renders
``ValidationResult`` objects (dq/runner.py) to a static HTML site —
an index page summarizing every suite run plus one detail page per
run — using only the stdlib, so the report is a plain artifact any
object store can serve.
"""

from __future__ import annotations

import html
import os
from typing import Mapping

from .runner import ValidationResult

_PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>{title}</title>
<style>
body {{ font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a2e; }}
table {{ border-collapse: collapse; margin-top: 1rem; }}
th, td {{ border: 1px solid #cbd5e1; padding: 0.4rem 0.8rem; text-align: left; }}
th {{ background: #eef2f7; }}
.ok {{ color: #166534; font-weight: 600; }}
.fail {{ color: #991b1b; font-weight: 600; }}
.meta {{ color: #64748b; font-size: 0.9rem; }}
</style>
</head>
<body>
{body}
</body>
</html>
"""


def _badge(ok: bool) -> str:
    return '<span class="ok">PASSED</span>' if ok else '<span class="fail">FAILED</span>'


def render_validation_html(name: str, result: ValidationResult) -> str:
    """One suite run → one detail page: run header + expectation table
    (the analogue of a GE validation-result page)."""
    rows = []
    for o in result.results:
        extras = {
            k: v
            for k, v in o.items()
            if k not in ("expectation", "column", "success")
        }
        rows.append(
            "<tr><td>{exp}</td><td>{col}</td><td>{ok}</td>"
            "<td class=\"meta\">{extra}</td></tr>".format(
                exp=html.escape(str(o["expectation"])),
                col=html.escape(str(o.get("column") or "—")),
                ok=_badge(bool(o["success"])),
                extra=html.escape(
                    ", ".join(f"{k}={v}" for k, v in sorted(extras.items())) or "—"
                ),
            )
        )
    body = (
        f"<h1>Validation: {html.escape(name)}</h1>"
        f"<p>Status: {_badge(result.success)} &middot; "
        f"rows checked: {result.row_count} &middot; "
        f"<span class=\"meta\">at {html.escape(result.checked_at)}</span></p>"
        "<table><tr><th>Expectation</th><th>Column</th><th>Result</th>"
        "<th>Details</th></tr>" + "".join(rows) + "</table>"
        '<p><a href="../index.html">&larr; all validations</a></p>'
    )
    return _PAGE.format(title=f"Validation: {html.escape(name)}", body=body)


def write_data_docs(
    out_dir: str, results: Mapping[str, ValidationResult]
) -> str:
    """Render a data-docs site: ``index.html`` summarizing every suite
    plus ``validations/<name>.html`` detail pages.  Returns the index
    path.  Idempotent — re-running a checkpoint overwrites its pages,
    exactly how GE's ``update_data_docs`` action behaves."""
    vdir = os.path.join(out_dir, "validations")
    os.makedirs(vdir, exist_ok=True)
    index_rows = []
    for name, result in sorted(results.items()):
        page = render_validation_html(name, result)
        with open(os.path.join(vdir, f"{name}.html"), "w") as fh:
            fh.write(page)
        n_fail = sum(1 for o in result.results if not o["success"])
        index_rows.append(
            "<tr><td><a href=\"validations/{n}.html\">{n}</a></td>"
            "<td>{ok}</td><td>{total}</td><td>{fails}</td>"
            "<td class=\"meta\">{at}</td></tr>".format(
                n=html.escape(name),
                ok=_badge(result.success),
                total=len(result.results),
                fails=n_fail,
                at=html.escape(result.checked_at),
            )
        )
    body = (
        "<h1>Data docs</h1>"
        "<table><tr><th>Suite</th><th>Status</th><th>Expectations</th>"
        "<th>Failures</th><th>Checked at</th></tr>"
        + "".join(index_rows)
        + "</table>"
    )
    index_path = os.path.join(out_dir, "index.html")
    with open(index_path, "w") as fh:
        fh.write(_PAGE.format(title="Data docs", body=body))
    return index_path
