import os
import tempfile

from pyspark.sql import functions as F

from python_mozetl_spark.jobs.hardware_report import (
    dimension_report,
    extract_latest_valid,
)
from python_mozetl_spark.jobs.landfill import parse_uri, run_landfill_sample
from python_mozetl_spark.operators.sample import two_phase_agg
from python_mozetl_spark.sinks.writers import (
    foreach_partition_sink,
    write_csv_export,
)


def test_landfill_uri_parsing_and_cap(spark):
    uuid = "12345678-1234-1234-1234-1234567890ab"
    rows = [
        # telemetry form: /submit/ns/<doc_id>/<doc_type>/...
        (f"/submit/telemetry/{uuid}/main/Firefox/54", {"Host": "h", "X-Forwarded-For": "1.2.3.4"}, "{}"),
        # generic form: /submit/ns/<doc_type>/<ver>/<doc_id>
        ("/submit/webpagectl/event/1/doc-1", {"Host": "h2"}, "{}"),
        ("/submit/webpagectl/event/1/doc-2", {"Host": "h3"}, "{}"),
    ]
    df = spark.createDataFrame(rows, "uri string, meta map<string,string>, content string")
    out = run_landfill_sample(df, per_group=1)
    got = {r["doc_id"]: r for r in out.collect()}
    # telemetry form parsed
    assert got[uuid]["namespace"] == "telemetry"
    assert got[uuid]["doc_type"] == "main"
    assert got[uuid]["doc_version"] == "1"
    # generic form parsed; cap=1 kept only the first doc_id of the group
    assert "doc-1" in got and "doc-2" not in got
    # metadata whitelist: X-Forwarded-For dropped, Host kept
    meta = got[uuid]["meta"].asDict()
    assert meta["Host"] == "h"
    assert "X_Forwarded_For" not in meta


def test_hardware_latest_valid_and_report(spark):
    rows = [
        # newest-first arrays; first entry invalid ⇒ second used
        ("c1", [None, "x86"], [False, True]),
        ("c2", ["arm", "x86"], [True, True]),
        ("c3", ["mips"], [False]),  # never valid ⇒ dropped
        ("c4", ["arm"], [True]),
    ]
    df = spark.createDataFrame(
        rows, "client_id string, arch array<string>, ok array<boolean>"
    )
    latest = extract_latest_valid(df, {"arch": F.col("arch")}, F.col("ok"))
    got = {r["client_id"]: r["arch"] for r in latest.collect()}
    assert got == {"c1": "x86", "c2": "arm", "c4": "arm"}
    report = {r["arch"]: r for r in
              dimension_report(latest, "arch", threshold=2).collect()}
    assert report["arm"]["n"] == 2
    assert report["Other"]["n"] == 1  # x86 count 1 < threshold
    assert abs(report["arm"]["share"] - 2 / 3) < 1e-6


def test_csv_export_guard(spark, tmp_path):
    df = spark.range(5).withColumnRenamed("id", "x")
    p = str(tmp_path / "out.csv")
    write_csv_export(df, p)
    assert open(p).read().startswith("x\n0\n")
    big = spark.range(100)
    try:
        write_csv_export(big, p, max_rows=10)
        assert False, "guard should refuse"
    except ValueError as e:
        assert "guard" in str(e)


def test_foreach_partition_sink_batches(spark, tmp_path):
    out_dir = str(tmp_path)

    def factory():
        import os as _os
        import uuid as _uuid

        def write(batch):
            fn = _os.path.join(out_dir, f"{_uuid.uuid4().hex}.txt")
            with open(fn, "w") as fh:
                fh.write("\n".join(str(r["id"]) for r in batch))

        return write

    df = spark.range(0, 100).repartition(4)
    foreach_partition_sink(df, factory, batch_size=10)
    seen = set()
    for fn in os.listdir(out_dir):
        with open(os.path.join(out_dir, fn)) as fh:
            seen |= {int(x) for x in fh.read().split()}
    assert seen == set(range(100))


def test_two_phase_agg_matches_direct(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)] + [("cold", 1.0)], ["k", "v"]
    )
    salted = {r["k"]: r["total"] for r in
              two_phase_agg(df, "k", F.sum("v"), "total").collect()}
    direct = {r["k"]: r["total"] for r in
              df.groupBy("k").agg(F.sum("v").alias("total")).collect()}
    assert salted == direct
