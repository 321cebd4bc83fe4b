#!/usr/bin/env python
"""Golden-density audit (VERDICT r9 item 5): for every registry query,
count how often its name and its underlying operator symbols appear in
tests/ — a proxy for how many hand-written assertions exercise it
beyond the oracle-parity sweep (which covers ALL queries uniformly and
therefore doesn't differentiate). Lists the thinnest entries so
back-fill effort goes where the hand-golden net is weakest.

Counting rule per query:
  * name_refs  — occurrences of the query name itself in tests/*.py
    (excluding the auto-parity harness, which iterates every name);
  * op_refs    — occurrences of the operator callables the q_
    function imports (parsed from its source), in tests/*.py.
Thinness = name_refs + op_refs.

Run: python tools/golden_density.py [N]     (default N = 15)
Output: one JSON line {"thinnest": [[name, score, name_refs,
op_refs, ops], ...], "zero_score": [...], "total": T}.
"""

from __future__ import annotations

import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# generic callables that appear in many q_ functions — counting them
# would credit unrelated tests
GENERIC = {
    "F", "TBL", "spark", "sf_dir", "broadcast", "col", "expr", "lit",
    "samples_view", "samples_aligned_view", "chan_events_view",
    "ensure_session_confs", "global_rank", "global_cumsum", "pin",
    "ensure_parallelism", "tempfile", "mkdtemp",
}


def _test_corpus() -> str:
    parts = []
    tdir = os.path.join(REPO, "tests")
    for fn in sorted(os.listdir(tdir)):
        if not fn.endswith(".py"):
            continue
        # the parity harness iterates EVERY registry name — skip it
        if fn in ("test_oracle_parity.py", "oracle_compare.py"):
            continue
        with open(os.path.join(tdir, fn)) as f:
            parts.append(f.read())
    return "\n".join(parts)


def _ops_for(qfunc) -> set[str]:
    """Operator symbols a q_ function pulls in: names imported inside
    its body plus pennsieve_streaming_spark attributes it calls."""
    try:
        src = inspect.getsource(qfunc)
    except (OSError, TypeError):
        return set()
    ops: set[str] = set()
    for m in re.finditer(
        r"from\s+pennsieve_streaming_spark[\w.]*\s+import\s+\(?([^)\n]+)\)?",
        src,
    ):
        for tok in m.group(1).split(","):
            tok = tok.strip().split(" as ")[0].strip()
            if tok and tok not in GENERIC:
                ops.add(tok)
    # multi-line parenthesized imports
    for m in re.finditer(
        r"from\s+pennsieve_streaming_spark[\w.]*\s+import\s+\(([^)]*)\)",
        src,
        re.S,
    ):
        for tok in m.group(1).split(","):
            tok = tok.strip().split(" as ")[0].strip()
            if tok and tok not in GENERIC:
                ops.add(tok)
    # called names resolved through the entry module's globals (the
    # registry imports many operators at module level, not in-body)
    import __spark_entry__ as entry

    for m in re.finditer(r"\b(\w+)\s*\(", src):
        tok = m.group(1)
        if tok in GENERIC or tok in ops:
            continue
        obj = getattr(entry, tok, None)
        mod = getattr(obj, "__module__", "") or ""
        if mod.startswith("pennsieve_streaming_spark"):
            ops.add(tok)
    return ops


def audit() -> dict:
    import __spark_entry__ as entry

    corpus = _test_corpus()
    rows = []
    qs = entry._queries_raw()
    for name, fn in qs.items():
        name_refs = len(re.findall(rf"\b{re.escape(name)}\b", corpus))
        # tests that drive the registry entry through its q_ function
        # (the back-fill pattern) count too
        fname = getattr(fn, "__name__", "")
        if fname and fname != name:
            name_refs += len(
                re.findall(rf"\b{re.escape(fname)}\b", corpus)
            )
        ops = _ops_for(fn)
        op_refs = sum(
            len(re.findall(rf"\b{re.escape(op)}\b", corpus))
            for op in ops
        )
        rows.append(
            {
                "name": name,
                "score": name_refs + op_refs,
                "name_refs": name_refs,
                "op_refs": op_refs,
                "ops": sorted(ops),
            }
        )
    rows.sort(key=lambda r: (r["score"], r["name"]))
    return {"total": len(rows), "rows": rows}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    a = audit()
    out = {
        "total": a["total"],
        "thinnest": [
            [r["name"], r["score"], r["name_refs"], r["op_refs"],
             ",".join(r["ops"])]
            for r in a["rows"][:n]
        ],
        "zero_score": [r["name"] for r in a["rows"] if r["score"] == 0],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
