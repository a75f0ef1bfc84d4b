"""Isolated A/B: bounded_bucket_pairs stage=True vs False on the
minhash pair stage (round-13 optimization).

Interleaved ABBA/BAAB order (external box load on this host drifts on
minute scales; interleaving puts both arms in every load window),
median of N per arm, noop-sink materialization.  Each run rebuilds its
own signature checkpoint so runs are independent; the signature cost
is common to both arms, so the delta attributes to the pair stage.

Usage: python tools/profile_bucket_stage.py [sf_dir] [reps_per_arm]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_mozetl_spark.ext.dedup import (  # noqa: E402
    _lsh_verify_pairs,
    _staged_signatures,
)
from python_mozetl_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session(app_name="profile_bucket_stage")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    def run(stage: bool) -> float:
        sig = _staged_signatures(
            docs, "doc_id", "text", 32, 3, "md5"
        ).localCheckpoint(eager=False)
        out = _lsh_verify_pairs(
            sig, "doc_id", 0.8, 32, 16, 10_000, stage=stage
        )
        spark.sparkContext.setJobDescription(
            f"bucket_stage A/B stage={stage}"
        )
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    # warm both arms (JIT/codegen/page cache), then interleave
    run(True)
    run(False)
    order = ([True, False, False, True] * ((reps + 1) // 2))[: 2 * reps]
    times: dict[bool, list[float]] = {True: [], False: []}
    for arm in order:
        times[arm].append(run(arm))
    for arm in (True, False):
        ts = sorted(times[arm])
        med = ts[len(ts) // 2]
        print(
            f"stage={arm}: median {med:.3f}s over {len(ts)} "
            f"(all: {', '.join(f'{t:.3f}' for t in times[arm])})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
