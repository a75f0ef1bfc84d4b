"""Rewrite registry-count markers in the repo docs from the live code.

Any ``<number> <!-- len(REGISTRY) -->`` occurrence in COVERAGE.md is
replaced with the actual ``len(REGISTRY)`` at HEAD — the count is
derived at generation, never hand-typed (round-8 task: the round-7
header shipped a stale hand-typed 160 while the registry held 178).
``tests/test_entry.py::test_coverage_md_registry_count_is_current``
fails if a commit leaves a marker stale.

Usage: ``python tools/sync_counts.py`` (idempotent; prints the files
it touched).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKER = re.compile(r"\d+ <!-- len\(REGISTRY\) -->")
DOCS = ["COVERAGE.md"]


def main() -> None:
    from python_mozetl_spark.plans.queries import REGISTRY

    repl = f"{len(REGISTRY)} <!-- len(REGISTRY) -->"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for doc in DOCS:
        path = os.path.join(root, doc)
        with open(path) as f:
            text = f.read()
        new = MARKER.sub(repl, text)
        if new != text:
            with open(path, "w") as f:
                f.write(new)
            print(f"updated {doc}: registry count -> {len(REGISTRY)}")
        else:
            print(f"{doc}: already current ({len(REGISTRY)})")


if __name__ == "__main__":
    main()
