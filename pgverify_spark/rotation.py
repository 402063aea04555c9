"""Evidence-derived driver-window rotation.

The round driver certifies roughly the first 50 ``queries()`` entries
per round against the DuckDB oracle and records the outcome in
``CORRECTNESS_r{N}.json`` at the repo root.  ``_DRIVER_PRIORITY``
(registry.py) reorders the registry so that window lands on the queries
whose certification evidence is WEAKEST:

1. certifiable queries with no driver row at all (registered after the
   last window closed), in base registration order;
2. everything else ordered by last-green round ascending (a query whose
   newest green row is r2 has had three rounds of refactors under it;
   one green last round needs nothing), ties broken by registration
   order;
3. the smoke core — the parity flagship rows — sorts by the SAME
   staleness key but is GUARANTEED a slot inside the window.  (It used
   to be pinned last, which silently broke the "fresh row every round"
   promise whenever the driver's actual window was shorter than the
   tuple: the two r5-stale rows the r10 verdict flagged were exactly
   the pinned-last smoke rows at positions 51-52 of a ~50-row window.)

Rows-only entries (no ``oracle_sql`` twin by design) can never
hash-certify, so they are excluded — a window row spent on them is a
row taken from a certifiable query.

This module DERIVES that order from the recorded evidence so the static
list can be asserted against it (tests/test_plan_audit.py): the
hand-maintained rotation can no longer silently drift from what the
correctness history actually says.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

#: Repo root — CORRECTNESS_r*.json live next to __spark_entry__.py.
REPO_ROOT = Path(__file__).resolve().parent.parent

#: Parity rows that keep a fresh driver row every round (§2.1 smoke).
SMOKE_CORE = (
    "full_fingerprint_lineitem",
    "rowcount_fingerprint_lineitem",
    "tpch_q1_pricing_summary",
)


def correctness_rounds(root: Path | str = REPO_ROOT) -> list[int]:
    """Rounds with a recorded CORRECTNESS file, ascending."""
    out = []
    for f in Path(root).glob("CORRECTNESS_r*.json"):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f.name)
        if m is not None:
            out.append(int(m.group(1)))
    return sorted(out)


def last_green_rounds(
    root: Path | str = REPO_ROOT, max_round: int | None = None
) -> dict[str, int]:
    """Newest round in which each query's driver row was fully green
    (rows + schema + value-hash all matched).  A query checked but NOT
    green in a later round keeps its older last-green round — failed
    evidence is not evidence.  ``max_round`` restricts to the evidence
    available when a given rotation was built (the drift test anchors
    on the rotation's own round so the driver landing a NEW file
    mid-round does not fail the suite retroactively)."""
    last: dict[str, int] = {}
    for f in sorted(Path(root).glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f.name)
        if m is None:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        try:
            recorded = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in recorded.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") in (True, None)
                and row.get("err") in (None, "")
            )
            if green and rnd >= last.get(name, 0):
                last[name] = rnd
    return last


def derived_priority(
    base_order: list[str] | tuple[str, ...],
    certifiable: set[str],
    last_green: dict[str, int] | None = None,
    smoke_core: tuple[str, ...] = SMOKE_CORE,
    n: int | None = None,
) -> tuple[str, ...]:
    """The weakest-evidence-first window order (see module docstring).

    ``base_order`` is the registry's base registration order
    (``registry._merged_entries()``), ``certifiable`` the names with an
    ``oracle_sql`` twin, ``n`` the number of rotating slots besides the
    smoke core (None = all certifiable queries).  The returned tuple has
    ``n + len(smoke_core)`` rows, globally staleness-ordered, with every
    smoke-core row inside it — a stale flagship lands at the FRONT, not
    past the driver's actual window.
    """
    if last_green is None:
        last_green = last_green_rounds()
    index = {q: i for i, q in enumerate(base_order)}
    key = lambda q: (last_green.get(q, 0), index[q])  # noqa: E731
    pool = [q for q in base_order if q in certifiable and q not in smoke_core]
    rest = sorted(pool, key=key)
    if n is not None:
        rest = rest[:n]
    smoke = sorted((q for q in smoke_core if q in certifiable), key=key)
    return tuple(sorted(rest + smoke, key=key))


def splice_into_registry(body: str, registry_path: Path | None = None) -> None:
    """Rewrite ``registry._DRIVER_PRIORITY``'s tuple body in place (the
    ``--write`` mode): the hand-paste step automated, so a rotation
    refresh after adding entries is one command and the drift test can
    never be left failing by a forgotten paste."""
    p = registry_path or REPO_ROOT / "pgverify_spark" / "registry.py"
    src = p.read_text()
    header = (
        "_DRIVER_PRIORITY = (\n"
        "    # Derived rotation (see module docstring): regenerate with\n"
        "    # `python -m pgverify_spark.rotation --write` after a new\n"
        "    # CORRECTNESS file lands or a new entry is registered.\n"
    )
    start = src.index("_DRIVER_PRIORITY = (")
    end = src.index("\n)\n", start) + len("\n)\n")
    p.write_text(src[:start] + header + body + "\n)\n" + src[end:])


def main() -> None:
    """``python -m pgverify_spark.rotation [n_rotating_slots] [--write]``
    — run after a new CORRECTNESS_r*.json lands (or a new entry is
    registered).  Prints the derived priority as a paste-ready tuple
    body; with ``--write`` it splices the body into
    registry._DRIVER_PRIORITY directly (the drift test enforces the
    match either way)."""
    import sys

    from pgverify_spark import registry

    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv[1:]
    merged = registry._merged_entries()
    certifiable = {n for n, (_, sql) in merged.items() if sql is not None}
    n = (
        int(args[0])
        if args
        else len(registry._DRIVER_PRIORITY) - len(SMOKE_CORE)
    )
    lg = last_green_rounds()
    lines = [
        f'    "{q}",  # last green r{lg.get(q, "—never")}'
        for q in derived_priority(list(merged), certifiable, lg, n=n)
    ]
    body = "\n".join(lines)
    print(body)
    if write:
        splice_into_registry(body)
        print(f"# spliced into registry._DRIVER_PRIORITY ({len(lines)} rows)")


if __name__ == "__main__":
    main()
