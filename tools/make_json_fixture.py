"""Generate the committed raw-JSON ping fixture (fixtures/events_pings.json).

The reference ingests schema-ful newline-delimited JSON ping files
(mozetl/main.py:10-24, mozetl/landfill/sampler.py:49-55); the engine's
S5 source is graded over this fixture — a deterministic NDJSON
derivation of the sf0.01 events table (every 17th event_id, nested
"meta" struct, null-preserving "value") so the Spark `read.json(path,
schema)` scan and the DuckDB `read_json` oracle read the identical
bytes.  Run once; the output is committed.

Usage: python tools/make_json_fixture.py
"""

from __future__ import annotations

import json
import os

import duckdb

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "events_pings.json")


def main() -> None:
    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT event_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               user_id, event_type, value, props
        FROM read_parquet('/root/testdata/sf0.01/events.parquet')
        WHERE event_id % 17 = 0
        ORDER BY event_id
        """
    ).fetchall()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        for event_id, ts_us, user_id, event_type, value, props in rows:
            ping = {
                "event_id": event_id,
                "ts_us": ts_us,
                "meta": {"user_id": user_id, "event_type": event_type},
                "value": value,  # stays null when null — S5 must preserve it
                "props": props,
            }
            f.write(json.dumps(ping, separators=(",", ":")) + "\n")
    print(f"wrote {len(rows)} pings to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
