"""Isolated A/B: bounded_bucket_pairs stage=True vs False on the
minhash pair stage (round-13 optimization).

Interleaved ABBA/BAAB order (external box load on this host drifts on
minute scales; interleaving puts both arms in every load window),
median of N per arm, noop-sink materialization.  Each run rebuilds its
own signature checkpoint so runs are independent; the signature cost
is common to both arms, so the delta attributes to the pair stage.

Usage: python tools/profile_bucket_stage.py [sf_dir] [reps_per_arm]

Round 14 (``--impl``, VERDICT r13 item 1): A/B the STAGING BACKEND
instead — localCheckpoint vs persist(MEMORY_AND_DISK), both stage=True
(env seam ``SPARK_GRAFT_BUCKET_STAGE_IMPL`` in bounded_bucket_pairs).
``--ioload`` additionally runs a synthetic disk-writer loop
(1 GiB fdatasync'd per pass, deleted and rewritten) for the WHOLE
interleaved window, to test the r13 VERDICT hypothesis that the
checkpoint's executor-block-storage writes are disproportionately
sensitive to I/O contention.  The persist arm clearCache()s after
every run so cached plans cannot accumulate across reps.
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
    impl_mode = "--impl" in sys.argv
    ioload = "--ioload" in sys.argv
    args = [a for a in sys.argv[1:] if a not in ("--impl", "--ioload")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(args[1]) if len(args) > 1 else 3
    spark = get_session(app_name="profile_bucket_stage")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    loader = None
    if ioload:
        import subprocess

        # fdatasync'd 1 GiB rewrite loop: steady write pressure on the
        # same device executor block storage (checkpoint) lands on
        loader = subprocess.Popen(
            [
                "bash",
                "-c",
                "while true; do dd if=/dev/zero of=/tmp/__ioload.bin "
                "bs=1M count=1024 conv=fdatasync 2>/dev/null; "
                "rm -f /tmp/__ioload.bin; done",
            ]
        )

    if impl_mode:
        def run_impl(impl: str) -> float:
            os.environ["SPARK_GRAFT_BUCKET_STAGE_IMPL"] = impl
            try:
                sig = _staged_signatures(
                    docs, "doc_id", "text", 32, 3, "md5"
                ).localCheckpoint(eager=False)
                out = _lsh_verify_pairs(
                    sig, "doc_id", 0.8, 32, 16, 10_000, stage=True
                )
                spark.sparkContext.setJobDescription(
                    f"bucket_stage impl A/B impl={impl}"
                )
                t0 = time.time()
                out.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                spark.sparkContext.setJobDescription(None)
                return dt
            finally:
                os.environ.pop("SPARK_GRAFT_BUCKET_STAGE_IMPL", None)
                spark.catalog.clearCache()

        for impl in ("checkpoint", "persist"):  # warm both arms
            run_impl(impl)
        order = (
            ["checkpoint", "persist", "persist", "checkpoint"]
            * ((reps + 1) // 2)
        )[: 2 * reps]
        times_i: dict[str, list[float]] = {"checkpoint": [], "persist": []}
        for arm_name in order:
            times_i[arm_name].append(run_impl(arm_name))
        for arm_name in ("checkpoint", "persist"):
            ts = sorted(times_i[arm_name])
            med = ts[len(ts) // 2]
            print(
                f"impl={arm_name} ioload={ioload}: median {med:.3f}s over "
                f"{len(ts)} (all: "
                f"{', '.join(f'{t:.3f}' for t in times_i[arm_name])})"
            )
        if loader is not None:
            loader.kill()
        spark.stop()
        return

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
    if loader is not None:
        loader.kill()
    spark.stop()


if __name__ == "__main__":
    main()
