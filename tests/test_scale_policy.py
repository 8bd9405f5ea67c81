"""Scale-policy guard: no forced broadcast of frames that scale with the
data.

A ``F.broadcast(...)`` hint pins the physical join strategy at ANY size;
at 100 TB every fact-proportional frame (customer, orders, lineitem,
part, events, documents, embeddings) is far past any broadcast budget,
so hints are reserved for provably bounded frames: the declared dim
policy (region, nation, supplier — ``catalog.DIM_TABLES``) and tiny
derived frames (group stats, band tables, centroids, query vectors).

This test walks the operator sources' ASTs: inside each function it
records which local names are bound to a ``load_table*(spark, sf_dir,
"<table>")`` chain for a scaling table, then flags any
``F.broadcast(<that name>)`` use.  Catching the regression class of
round 1's ``behavior_funnel``/``behavior_retention`` (VERDICT.md r1,
"What's wrong" #5) statically, before a plan audit ever runs.
"""

from __future__ import annotations

import ast
from pathlib import Path

OPERATORS_DIR = (
    Path(__file__).resolve().parent.parent / "open_source_etl_spark" / "operators"
)

# tables whose cardinality scales with the data volume
SCALING_TABLES = {
    "customer",
    "orders",
    "lineitem",
    "part",
    "events",
    "documents",
    "embeddings",
}


def _root_call_table(node: ast.AST) -> str | None:
    """If the expression is a call chain rooted at load_table/
    load_table_compute with a literal table name, return that name."""
    while isinstance(node, ast.Call):
        func = node.func
        name = None
        if isinstance(func, ast.Name):
            name = func.id
        elif isinstance(func, ast.Attribute):
            # chained: load_table(...).filter(...).select(...)
            node = func.value
            continue
        if name in ("load_table", "load_table_compute"):
            for arg in node.args:
                if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                    if arg.value in SCALING_TABLES:
                        return arg.value
            return None
        return None
    return None


def _broadcast_violations(tree: ast.AST) -> list[str]:
    violations: list[str] = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        scaling_names: dict[str, str] = {}
        for stmt in ast.walk(fn):
            if isinstance(stmt, ast.Assign) and len(stmt.targets) == 1:
                tgt = stmt.targets[0]
                if isinstance(tgt, ast.Name):
                    tbl = _root_call_table(stmt.value)
                    if tbl:
                        scaling_names[tgt.id] = tbl
        for call in ast.walk(fn):
            if (
                isinstance(call, ast.Call)
                and isinstance(call.func, ast.Attribute)
                and call.func.attr == "broadcast"
                and call.args
                and isinstance(call.args[0], ast.Name)
                and call.args[0].id in scaling_names
            ):
                violations.append(
                    f"{fn.name}: F.broadcast({call.args[0].id}) — bound to "
                    f"scaling table '{scaling_names[call.args[0].id]}' "
                    f"(line {call.lineno})"
                )
    return violations


def test_no_forced_broadcast_of_scaling_tables():
    all_violations: list[str] = []
    for path in sorted(OPERATORS_DIR.glob("*.py")):
        tree = ast.parse(path.read_text())
        for v in _broadcast_violations(tree):
            all_violations.append(f"{path.name}::{v}")
    assert not all_violations, (
        "forced broadcast of data-scaling frames (drop the hint; AQE "
        "broadcasts small frames at runtime):\n  " + "\n  ".join(all_violations)
    )
