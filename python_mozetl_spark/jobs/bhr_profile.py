"""BHR Gecko hang-profile assembly — the driver-side format tail.

Closes the last declared reference-logic gap (COVERAGE.md "Known
gaps"): mozetl/bhr_collection/bhr_collection.py:43-185 (the
UniqueKeyedTable interning machinery) and :205-456 (ProfileProcessor —
prune cache, stack/func/string interning, per-date sample
accumulation, struct-of-arrays rendering).  The assembler consumes the
SMALL aggregated frame ``jobs/bhr.py:run_bhr_collection`` produces —
one row per (stack, thread, build_date, platform), thousands of rows,
kilobytes — never raw pings, so this is bounded driver-side format
conversion by construction (SURVEY §7.3), not a collect of cluster
data.

The implementation is a fresh dictionary-encoder, not a translation:
interning is a plain dict-backed :class:`_Interner` (key → dense
index), the prefix-tree prune pass is one explicit walk accumulating
subtree hang-ms, and the per-date sample lists are sparse dicts
rendered to None-padded arrays at the end.  The OUTPUT shape matches
the reference renderer so downstream hang-viewer tooling reads it
unchanged:

- thread: ``{name, processType, libs, funcTable, stackTable,
  annotationsTable, sampleTable, stringArray, dates}``;
- all tables are struct-of-arrays with a ``length`` field; stacks and
  annotations are prefix-chain encoded; ``stringArray`` holds every
  interned string once;
- profile: ``{threads, usageHoursByDate, uuid}`` (or one
  single-thread profile per thread with ``split_threads=True``,
  the reference's ``split_threads_in_out_file`` shape).

One deliberate divergence: the reference's ``use_minimal_sample_table``
renderer mislabels its columns (``inner_struct_of_arrays`` zips
2 ``key_names`` over 4-tuples, emitting runnable indices under
``"platform"``, :68-79,138-151); the minimal mode here emits
``{stack, platform, length}`` with the actual platform column.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Sequence

ROOT_FUNC = "(root)"
OTHER_FUNC = "(other)"
TAB_PROCESS_THREADS = ("Gecko_Child", "Gecko_Child_ForcePaint")


class _Interner:
    """Dense-index dictionary encoder: ``index(key)`` returns a stable
    0-based id, first occurrence wins.  ``rows`` holds one value per
    id (whatever the caller stores)."""

    def __init__(self) -> None:
        self._ids: dict = {}
        self.rows: list = []

    def index(self, key, row=None) -> int:
        i = self._ids.get(key)
        if i is None:
            i = len(self.rows)
            self._ids[key] = i
            self.rows.append(key if row is None else row)
        return i

    def __len__(self) -> int:
        return len(self.rows)


def _lib_record(name: str) -> dict:
    """Library metadata record (reference get_default_lib, :104-112):
    only the debug names are known at assembly time."""
    return {
        "name": re.sub(r"\.pdb$", "", name),
        "offset": 0,
        "path": "",
        "debugName": name,
        "debugPath": name,
        "arch": "",
    }


class _ThreadBuilder:
    """All interning state for one thread's profile tables."""

    def __init__(self, name: str) -> None:
        self.name = name
        self.strings = _Interner()
        self.libs = _Interner()
        self.funcs = _Interner()      # (name_sid, lib_id|None)
        self.stacks = _Interner()     # (prefix|None, func_id)
        self.annotations = _Interner()  # (prefix|None, name_sid, value_sid)
        self.samples = _Interner()    # (stack, runnable_sid, ann, platform_sid)
        # per build_date: {"ms": {sample_id: float}, "count": {...}}
        self.dates: dict[str, dict[str, dict[int, float]]] = {}
        # prune tree: node key (func, lib, parent_node) → node id;
        # rows hold accumulated subtree hang-ms
        self.prune = _Interner()
        self._root_node = self.prune.index((ROOT_FUNC, None, None), row=[0.0])
        # stack 0 is the root for every chain
        self.stacks.index((None, self._func(ROOT_FUNC, None)))

    def _func(self, name: str, lib: str | None) -> int:
        lib_id = None if lib is None else self.libs.index(lib, _lib_record(lib))
        return self.funcs.index((self.strings.index(name), lib_id))

    def pre_ingest(self, stack: Sequence[tuple[str, str | None]], hang_ms: float) -> None:
        """Prune pre-pass: accumulate hang-ms down the stack's prefix
        chain (root first), so ingest can test each frame's subtree
        share against its parent's."""
        self.prune.rows[self._root_node][0] += hang_ms
        node = self._root_node
        for func_name, lib in stack:
            node = self.prune.index((func_name, lib, node), row=[0.0])
            self.prune.rows[node][0] += hang_ms

    def ingest(
        self,
        stack: Sequence[tuple[str, str | None]],
        runnable: str,
        build_date: str,
        annotations: Sequence[tuple[str, str]],
        platform: str,
        hang_ms: float,
        hang_count: float,
        threshold: float,
    ) -> None:
        ann = None
        for name, value in annotations:
            ann = self.annotations.index(
                (ann, self.strings.index(name), self.strings.index(value))
            )
        stack_id, node = 0, self._root_node
        for func_name, lib in stack:
            child = self.prune.index((func_name, lib, node), row=[0.0])
            share = self.prune.rows[child][0] / self.prune.rows[node][0]
            if share > threshold:
                stack_id = self.stacks.index((stack_id, self._func(func_name, lib)))
                node = child
            else:
                # cold subtree: collapse the rest under "(other)"
                stack_id = self.stacks.index((stack_id, self._func(OTHER_FUNC, lib)))
                break
        sample_id = self.samples.index(
            (
                stack_id,
                self.strings.index(runnable),
                ann,
                self.strings.index(platform),
            )
        )
        date = self.dates.setdefault(build_date, {"ms": {}, "count": {}})
        date["ms"][sample_id] = date["ms"].get(sample_id, 0.0) + hang_ms
        date["count"][sample_id] = date["count"].get(sample_id, 0.0) + hang_count

    @staticmethod
    def _columns(rows: list, names: Sequence[str]) -> dict:
        out = {n: [r[i] for r in rows] for i, n in enumerate(names)}
        out["length"] = len(rows)
        return out

    @staticmethod
    def _sparse_list(cells: dict[int, float]) -> list:
        dense: list = [None] * (max(cells) + 1 if cells else 0)
        for i, v in cells.items():
            dense[i] = v
        return dense

    def render(self, minimal_sample_table: bool) -> dict:
        if minimal_sample_table:
            sample_rows = [(s[0], s[3]) for s in self.samples.rows]
            sample_table = self._columns(sample_rows, ("stack", "platform"))
        else:
            sample_table = self._columns(
                self.samples.rows, ("stack", "runnable", "annotations", "platform")
            )
        dates = [
            {
                "date": d,
                "sampleHangMs": self._sparse_list(cells["ms"]),
                "sampleHangCount": self._sparse_list(cells["count"]),
            }
            for d, cells in sorted(self.dates.items())
        ]
        if minimal_sample_table:
            for d in dates:
                del d["sampleHangMs"]
        # funcTable rows are (name_sid, lib_id); stackTable rows are
        # (prefix, func) — note the reference renders stacks in
        # (prefix, func) order too (:126-129)
        return {
            "name": self.name,
            "processType": "tab" if self.name in TAB_PROCESS_THREADS else "default",
            "libs": list(self.libs.rows),
            "funcTable": self._columns(self.funcs.rows, ("name", "lib")),
            "stackTable": self._columns(self.stacks.rows, ("prefix", "func")),
            "annotationsTable": self._columns(
                self.annotations.rows, ("prefix", "name", "value")
            ),
            "sampleTable": sample_table,
            "stringArray": list(self.strings.rows),
            "dates": dates,
        }


def assemble_hang_profile(
    rows: Iterable[dict],
    usage_hours_by_date: dict[str, float] | None = None,
    uuid: str | None = None,
    stack_acceptance_threshold: float = 0.01,
    minimal_sample_table: bool = False,
    split_threads: bool = False,
):
    """Aggregated hang rows → the interned Gecko hang-profile document.

    ``rows``: dicts with ``thread``, ``build_date``, ``platform``,
    ``stack`` (root-first ``(func_name, lib_name)`` pairs),
    ``hang_ms``, ``hang_count``, and optionally ``runnable`` and
    ``annotations`` (``(name, value)`` pairs).  Rows with
    ``hang_ms <= 0`` are dropped (reference ingest, :374-380).

    Two passes per thread — a prune pre-pass accumulating subtree
    hang-ms, then the interning ingest where a frame whose subtree
    carries ≤ ``stack_acceptance_threshold`` of its parent's hang-ms
    is collapsed to ``"(other)"`` (reference :334-352).

    ``minimal_sample_table`` drops runnable/annotation columns and the
    per-date ms list, and skips Gecko_Child samples entirely
    (reference :354-356).
    """
    rows = [r for r in rows if r["hang_ms"] > 0.0]
    threads: dict[str, _ThreadBuilder] = {}
    for r in rows:
        tb = threads.setdefault(r["thread"], _ThreadBuilder(r["thread"]))
        tb.pre_ingest(r["stack"], r["hang_ms"])
    for r in rows:
        if minimal_sample_table and r["thread"] == "Gecko_Child":
            continue
        threads[r["thread"]].ingest(
            r["stack"],
            r.get("runnable", ""),
            r["build_date"],
            r.get("annotations", ()),
            r["platform"],
            r["hang_ms"],
            r["hang_count"],
            stack_acceptance_threshold,
        )
    rendered = [
        tb.render(minimal_sample_table) for tb in threads.values()
    ]
    usage = dict(usage_hours_by_date or {})
    if split_threads:
        return [
            {
                "name": t["name"],
                "threads": [t],
                "usageHoursByDate": usage,
                "uuid": uuid,
            }
            for t in rendered
        ]
    return {"threads": rendered, "usageHoursByDate": usage, "uuid": uuid}


def profile_rows_from_aggregates(
    aggregates,
    symbol_map: dict[str, str] | None = None,
) -> list[dict]:
    """Bridge from ``jobs/bhr.py:hang_aggregates`` output (stack =
    ``array<struct<module, offset>>``) to assembler rows: each frame
    becomes ``(func, lib)`` where func is the symbolicated name (or
    the hex offset when unsymbolicated — the reference's pre-symbol
    display form) and lib is the module's debug name.

    The ``.collect()`` here is the documented out-of-engine boundary:
    the aggregate frame is one row per distinct (stack, thread, date,
    platform) — bounded by content, not by corpus size.
    """
    sym = symbol_map or {}
    out = []
    for r in aggregates.collect():
        frames = []
        for fr in r["stack"]:
            module = fr["module"]
            lib = None if module is None else module.split("\\", 1)[0]
            func = sym.get(module) if module is not None else None
            if func is None:
                off = fr["offset"]
                if off is None:
                    func = "???"
                elif isinstance(off, int):
                    func = f"{off:#010x}"
                else:
                    func = str(off)
            frames.append((func, lib))
        out.append(
            {
                "thread": r["thread"],
                "build_date": r["build_date"],
                "platform": r["platform"] or "",
                "stack": frames,
                "hang_ms": float(r["total_hang_ms"]),
                "hang_count": float(r["hang_count"]),
            }
        )
    return out
