"""Structured event log — the reference's ad-hoc event couts made queryable.

The reference announces map events on stdout (new plane/door/room merges,
GeoSemHelpers.cc:248,325,399) and leveled Verbose messages (System.h:57-82).
Here every lifecycle event is one record the host can filter, count, or dump
as JSON lines — the observability layer tests and the CLI report from.
"""

from __future__ import annotations

import json
import time


class EventLog:
    """Append-only in-memory event records: (wall_time, kind, payload)."""

    def __init__(self, enabled: bool = True, verbose: bool = False):
        self.enabled = enabled
        self.verbose = verbose
        self.records: list[tuple[float, str, dict]] = []

    def emit(self, kind: str, **payload) -> None:
        if not self.enabled:
            return
        self.records.append((time.time(), kind, payload))
        if self.verbose:
            print(f"[{kind}] {payload}")

    def count(self, kind: str) -> int:
        return sum(1 for _, k, _ in self.records if k == kind)

    def of_kind(self, kind: str) -> list[dict]:
        return [p for _, k, p in self.records if k == kind]

    def dump_jsonl(self, path: str) -> None:
        def _coerce(v):
            try:  # device scalars / numpy values stored lazily by emit()
                return v.item()
            except AttributeError:
                return v

        with open(path, "w") as f:
            for t, k, p in self.records:
                row = {"t": t, "kind": k}
                row.update({kk: _coerce(vv) for kk, vv in p.items()})
                f.write(json.dumps(row, default=str) + "\n")
