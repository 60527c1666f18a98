"""PII scrubbing: planted-data redaction behavior + DuckDB dialect parity.

The driver's synthetic corpus contains no PII (counts are zero there, by
design), so the actual redaction semantics are pinned here on planted
emails / IPv4s / phone numbers — including the ordering subtlety that an
email whose domain is IP-shaped is consumed by the email stage first.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEXTS = [
    "contact bob.smith+x@example.co.uk or sue@test.io for details",
    "server at 10.0.0.1 and 192.168.255.3 responded",
    "call +1-555-123-4567 or 555 987 6543 now",
    "mixed alice@example.com from 172.16.0.9 phone 123-456-7890",
    "clean document with no pii at all",
    "edge bob@1.2.3.4 weird",
]


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pii")
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(TEXTS))), "text": TEXTS,
            "lang": ["en"] * len(TEXTS), "source": ["s"] * len(TEXTS),
            "n_chars": [len(t) for t in TEXTS],
        }),
        f"{d}/documents.parquet",
    )
    return str(d)


def test_pii_redaction(spark, pii_dir):
    from kstore_spark.functions.text import pii_scrub

    rows = {r["doc_id"]: r for r in pii_scrub(spark, pii_dir).collect()}
    assert rows[0]["n_emails"] == 2 and "<EMAIL>" in rows[0]["clean"]
    assert "bob.smith" not in rows[0]["clean"]
    assert rows[1]["n_ips"] == 2 and rows[1]["clean"].count("<IP>") == 2
    assert rows[2]["n_phones"] == 2 and rows[2]["clean"].count("<PHONE>") == 2
    assert (rows[3]["n_emails"], rows[3]["n_ips"], rows[3]["n_phones"]) == (1, 1, 1)
    assert rows[4]["clean"] == TEXTS[4]  # clean text passes untouched
    # an IP-shaped domain is NOT an email (TLD must be alphabetic); the
    # IP stage redacts it instead, leaving the local part visible
    assert rows[5]["n_emails"] == 0 and rows[5]["n_ips"] == 1
    assert rows[5]["clean"] == "edge bob@<IP> weird"


def test_pii_duckdb_parity(spark, pii_dir):
    """Java-regex and RE2 must agree on the planted corpus — this is the
    property that lets the driver hash-check scrubbed text."""
    from kstore_spark.functions.text import PII_SCRUB_SQL, pii_scrub

    got = sorted(tuple(r) for r in pii_scrub(spark, pii_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pii_dir}/documents.parquet')"
    )
    assert got == sorted(tuple(r) for r in con.execute(PII_SCRUB_SQL).fetchall())
