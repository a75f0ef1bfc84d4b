"""The rotating sf0.1 parity sweep (round 12, VERDICT r11 task 3).

The full-registry sweep at sf0.1 is the detector that caught the three
round-11 cross-engine numerics splits (SCALE.md §6i) — and it costs
~3.5 h because the pair-query oracles are intentionally brute-force
quadratic.  This tool institutionalizes it as a ROTATING THIRD per
round, so every query gets a 10×-scale parity check at least every
three rounds without the per-round cost:

- the round-``N`` slice is ``sorted(REGISTRY)[N % 3 :: 3]`` —
  residue-class interleaving, so adding a query perturbs only its own
  residue class (a contiguous third would shift every boundary);
- every query named on the command line is ADDED to the slice — pass
  the round's impl-changed queries so a changed expression tree never
  waits out the rotation;
- output contract = tools/check.py verbatim (one row per query, the
  PARTIAL banner marks it non-certifying); commit the output as
  ``CHECK_r{N}_sf0.1.txt``.

Usage::

    python tools/sweep_sf01.py 12 [extra_query ...] \
        | tee CHECK_r12_sf0.1.txt
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def slice_for_round(round_no: int, names: list[str]) -> list[str]:
    return sorted(names)[round_no % 3 :: 3]


def main() -> int:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        print(__doc__, file=sys.stderr)
        return 2
    round_no = int(sys.argv[1])
    extra = sys.argv[2:]
    from python_mozetl_spark.plans.queries import REGISTRY

    unknown = [q for q in extra if q not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    queries = slice_for_round(round_no, list(REGISTRY))
    queries += [q for q in extra if q not in queries]
    print(
        f"# sf0.1 rotating sweep, round {round_no}: residue class "
        f"{round_no % 3} of 3 ({len(queries)} queries incl. "
        f"{len(extra)} named adds)",
        flush=True,
    )
    return subprocess.call(
        [
            sys.executable,
            os.path.join(ROOT, "tools", "check.py"),
            "/root/testdata/sf0.1",
            *queries,
        ]
    )


if __name__ == "__main__":
    sys.exit(main())
