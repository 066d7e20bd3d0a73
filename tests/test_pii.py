"""PII scrub kernel + Spark + SQL-oracle parity on adversarial strings."""

from __future__ import annotations

import pytest

from datatrove_spark.config import PIIConfig
from datatrove_spark.operators import pii

CASES = [
    # round-robin cycling across >2 emails in one doc
    ("a@b.com then c.d@e-f.org and x_y@z.co end", None),
    # private IP skipped, counter NOT advanced; next public gets replacement 0
    ("ips: 10.0.0.1 then 8.8.8.8 then 9.9.9.9 done", None),
    # multicast is 'global' per ipaddress quirk -> replaced
    ("224.0.0.5 multicast", None),
    # leading-zero octet -> invalid -> untouched
    ("bad 01.2.3.4 ip", None),
    # adjacent matches + punctuation boundaries
    ("x@y.com,a@b.org;1.2.3.4!", None),
    # reserved / benchmark / doc ranges untouched
    ("198.18.0.1 198.51.100.7 203.0.113.9 240.0.0.1 255.255.255.255 0.1.2.3", None),
    # 192.88.99.1 is global (6to4 relay unreserved in python)
    ("relay 192.88.99.1 here", None),
    # empty / no matches
    ("", None),
    ("no pii here at all", None),
    # email-like but not (no tld dot ok? local@single-label is NOT matched)
    ("nope@localhost and a@@b.com", None),
    # ip embedded in longer dotted string (regex has no boundaries)
    ("version 1.2.3.4.5 here", None),
]


def test_kernel_golden():
    cfg = PIIConfig()
    out = pii.scrub("mail a@b.com and c@d.org and e@f.net; ip 8.8.8.8 10.0.0.1 9.9.9.9", cfg)
    assert out == (
        "mail email@example.com and firstname.lastname@example.org and email@example.com; "
        "ip 22.214.171.124 10.0.0.1 126.96.36.199"
    )


def test_kernel_private_skip_does_not_advance():
    out = pii.scrub("10.0.0.1 8.8.8.8", PIIConfig())
    assert out == "10.0.0.1 22.214.171.124"


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(i, t) for i, (t, _) in enumerate(CASES)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spark_matches_kernel(spark, frame):
    got = {r.doc_id: r.pii_text for r in pii.apply(frame).select("doc_id", "pii_text").collect()}
    for i, (t, _) in enumerate(CASES):
        assert got[i] == pii.scrub(t), f"case {i}: {t!r}"


def test_duckdb_oracle_matches_kernel():
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    for i, (t, _) in enumerate(CASES):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, t])
    sql = pii.oracle_sql(table="t")
    got = dict(con.execute(sql).fetchall())
    for i, (t, _) in enumerate(CASES):
        assert got[i] == pii.scrub(t), f"case {i}: {t!r}"


def test_sql_is_public_matches_ipaddress():
    """Integer-range rendering must equal ipaddress.is_global on a boundary
    sweep + pseudo-random sample."""
    import ipaddress

    import duckdb

    ips = []
    for base in ["0.0.0.0", "10.0.0.0", "100.64.0.0", "100.128.0.0", "127.0.0.0",
                 "169.254.0.0", "172.16.0.0", "172.32.0.0", "192.0.0.0", "192.0.0.8",
                 "192.0.0.170", "192.0.0.172", "192.0.2.0", "192.0.3.0", "192.88.99.1",
                 "192.168.0.0", "192.169.0.0", "198.18.0.0", "198.20.0.0",
                 "198.51.100.0", "203.0.113.0", "224.0.0.0", "240.0.0.0",
                 "255.255.255.255", "8.8.8.8", "1.0.0.1"]:
        ips.append(base)
    for k in range(500):
        v = (k * 2654435761) % (1 << 32)
        ips.append(".".join(str((v >> s) & 255) for s in (24, 16, 8, 0)))

    con = duckdb.connect()
    expr = pii._sql_is_public("m")
    rows = con.execute(
        f"SELECT m, {expr} FROM (SELECT unnest(?) AS m)", [ips]
    ).fetchall()
    for m, got in rows:
        assert got == ipaddress.ip_address(m).is_global, m
