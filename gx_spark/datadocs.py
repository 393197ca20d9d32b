"""Data-docs sink: static HTML rendering of validation results.

Minimal, dependency-free re-creation of the reference's data-docs renderer
(ref: great_expectations/render/renderer/ValidationResultsPageRenderer +
DefaultSiteBuilder): one self-contained HTML page per suite run, plus an
index page over runs.  The renderer consumes only the JSON-serializable
SuiteValidationResult — no Spark, no engine state — so it can run on the
driver after a checkpoint, or offline over stored `_validation_results`
rows."""

from __future__ import annotations

import html
import json
import os
from typing import Any

from .model import SuiteValidationResult

_CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; margin: 2rem;
       color: #1a1a2e; background: #fafafa; }
h1 { font-size: 1.4rem; } h2 { font-size: 1.1rem; margin-top: 1.5rem; }
table { border-collapse: collapse; width: 100%; background: #fff;
        box-shadow: 0 1px 3px rgba(0,0,0,.08); }
th, td { text-align: left; padding: .45rem .6rem; border-bottom: 1px solid #eee;
         font-size: .85rem; vertical-align: top; }
th { background: #f0f0f5; }
.pass { color: #0a7d32; font-weight: 600; } .fail { color: #c0392b; font-weight: 600; }
.err { color: #8e44ad; font-weight: 600; }
.stat { display: inline-block; margin-right: 1.5rem; padding: .4rem .8rem;
        background: #fff; border: 1px solid #e0e0e8; border-radius: 6px; }
code { background: #f4f4f8; padding: .1rem .3rem; border-radius: 3px;
       font-size: .8rem; word-break: break-all; }
"""


def _fmt(value: Any, limit: int = 200) -> str:
    s = json.dumps(value, default=str) if not isinstance(value, str) else value
    if len(s) > limit:
        s = s[:limit] + "…"
    return html.escape(s)


def render_validation_html(result: SuiteValidationResult) -> str:
    """One standalone HTML page for a suite validation result."""
    stats = result.statistics
    rows = []
    for i, r in enumerate(result.results):
        cfg = r.expectation_config
        if r.exception_info.get("raised_exception"):
            status = '<span class="err">ERROR</span>'
        elif r.success:
            status = '<span class="pass">PASS</span>'
        else:
            status = '<span class="fail">FAIL</span>'
        kwargs = {k: v for k, v in cfg.kwargs.items() if k != "result_format"}
        res = r.result or {}
        obs = res.get("observed_value")
        detail_bits = []
        if "unexpected_count" in res:
            detail_bits.append(f"unexpected: {res['unexpected_count']}")
        if res.get("unexpected_percent") is not None:
            detail_bits.append(f"{res['unexpected_percent']:.3f}%")
        if res.get("partial_unexpected_list"):
            detail_bits.append(
                f"sample: {_fmt(res['partial_unexpected_list'][:5], 120)}"
            )
        if r.exception_info.get("exception_message"):
            detail_bits.append(_fmt(r.exception_info["exception_message"], 160))
        rows.append(
            f"<tr><td>{i}</td><td>{status}</td>"
            f"<td><code>{html.escape(cfg.expectation_type)}</code></td>"
            f"<td><code>{_fmt(kwargs)}</code></td>"
            f"<td>{_fmt(obs) if obs is not None else ''}</td>"
            f"<td>{' · '.join(detail_bits)}</td></tr>"
        )
    verdict = (
        '<span class="pass">SUCCESS</span>' if result.success
        else '<span class="fail">FAILED</span>'
    )
    pct = stats.get("success_percent")
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{html.escape(result.suite_name)} — validation</title>
<style>{_CSS}</style></head><body>
<h1>Suite <code>{html.escape(result.suite_name)}</code> — {verdict}</h1>
<div>
<span class="stat">run <code>{html.escape(result.run_id)}</code></span>
<span class="stat">{stats.get('successful_expectations', 0)} / {stats.get('evaluated_expectations', 0)} passed</span>
<span class="stat">{f"{pct:.1f}%" if pct is not None else "—"}</span>
</div>
<h2>Expectations</h2>
<table><tr><th>#</th><th>status</th><th>expectation</th><th>kwargs</th>
<th>observed</th><th>details</th></tr>
{''.join(rows)}
</table>
</body></html>"""


def render_index_html(entries: list[dict[str, Any]]) -> str:
    rows = [
        f"<tr><td><a href='{html.escape(e['path'])}'>{html.escape(e['suite_name'])}</a></td>"
        f"<td><code>{html.escape(e['run_id'])}</code></td>"
        f"<td>{'<span class=pass>SUCCESS</span>' if e['success'] else '<span class=fail>FAILED</span>'}</td></tr>"
        for e in entries
    ]
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Data docs</title><style>{_CSS}</style></head>
<body><h1>Validation results</h1>
<table><tr><th>suite</th><th>run</th><th>status</th></tr>{''.join(rows)}</table>
</body></html>"""


class DataDocsSite:
    """File-system data-docs site: write_result() per run + a maintained
    index.html (the DefaultSiteBuilder role)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._index_path = os.path.join(root, "index.json")

    def write_result(self, result: SuiteValidationResult) -> str:
        fname = f"{result.suite_name}__{result.run_id}.html"
        path = os.path.join(self.root, fname)
        with open(path, "w") as f:
            f.write(render_validation_html(result))
        entries = []
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                entries = json.load(f)
        entries = [e for e in entries if e["path"] != fname]
        entries.append({"path": fname, "suite_name": result.suite_name,
                        "run_id": result.run_id, "success": result.success})
        with open(self._index_path, "w") as f:
            json.dump(entries, f, indent=1)
        with open(os.path.join(self.root, "index.html"), "w") as f:
            f.write(render_index_html(entries))
        return path
