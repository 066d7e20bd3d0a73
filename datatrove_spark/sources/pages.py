"""Deterministic synthetic Common-Crawl-style `pages` table.

Schema per BASELINE.json input_hint:

    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Built entirely from ``spark.range(n)`` + JVM column expressions (no driver
loops, no Python UDFs) so generation itself scales to any row count across
any number of executors and is byte-deterministic for a given (n, seed) —
the in-sandbox stand-in for a real Iceberg pages table (the reference reads
the same shape out of WARC files, /root/reference/src/datatrove/pipeline/
readers/warc.py:84-131).

~70% of docs are "clean" English prose built from seeded word pools; the
rest deterministically exercise every drop reason of the quality battery
plus PII scrub targets, so the pipeline's keep/drop mix is realistic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# pools are fixed vocabulary — part of the generator's contract
_COMMON = (
    "time year people way day man thing woman life child world school state "
    "family student group country problem hand part place case week company "
    "system program question work government number night point home water "
    "room mother area money story fact month lot right study book eye job "
    "word business issue side kind head house service friend father power "
    "hour game line end member law car city community name president team "
    "minute idea body information back parent face others level office door "
    "health person art war history party result change morning reason "
    "research girl guy moment air teacher force education"
).split()
_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")
_GERMAN = (
    "zeit jahr leute weg tag mann sache frau leben kind welt schule staat "
    "familie gruppe land problem hand teil platz fall woche firma frage "
    "arbeit regierung nummer nacht punkt haus wasser zimmer mutter geld"
).split()

EPOCH = "2024-01-01 00:00:00"


def _h(seed: int, *cols: Column | str | int) -> Column:
    """Deterministic 60-bit non-negative hash of (seed, *cols)."""
    parts = [F.lit(str(seed))] + [c if isinstance(c, Column) else F.lit(str(c)) for c in cols]
    return F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10).cast("long")


def _pick(pool: tuple[str, ...] | list[str], h: Column) -> Column:
    arr = F.array(*[F.lit(w) for w in pool])
    return F.element_at(arr, (F.pmod(h, F.lit(len(pool))) + 1).cast("int"))


def _sentence(seed: int, doc: Column, s: Column, pool, n_words: Column) -> Column:
    """One sentence: n_words pool words, every 4th a stop word, '.'-terminated."""
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.when(
            i % 4 == 2, _pick(_STOP, _h(seed, doc, s, i, "stop"))
        ).otherwise(_pick(pool, _h(seed, doc, s, i, "w"))),
    )
    return F.concat(F.array_join(words, " "), F.lit("."))


def _prose(seed: int, doc: Column, pool, n_sents: Column, salt: str) -> Column:
    """n_sents sentences joined into '\\n'-separated lines (2 sentences/line)."""
    sents = F.transform(
        F.sequence(F.lit(0), n_sents - 1),
        lambda s: _sentence(seed, doc, F.concat(F.lit(salt), s.cast("string")), pool,
                            F.pmod(_h(seed, doc, s, salt, "len"), F.lit(7)) + 8),
    )
    lines = F.transform(
        F.sequence(F.lit(0), ((n_sents + 1) / 2).cast("int") - 1),
        lambda i: F.array_join(F.slice(sents, (i * 2 + 1).cast("int"), 2), " "),
    )
    return F.array_join(lines, "\n")


def generate_pages(spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    doc = F.col("id")
    kind = F.pmod(_h(seed, doc, "kind"), F.lit(20))
    n_sents = (F.pmod(_h(seed, doc, "ns"), F.lit(10)) + 6).cast("int")

    good = _prose(seed, doc, _COMMON, n_sents, "g")
    german = _prose(seed, doc, _GERMAN, n_sents, "de")

    email = F.concat(
        _pick(_COMMON, _h(seed, doc, "em1")), F.lit("."),
        _pick(_COMMON, _h(seed, doc, "em2")), F.lit("@example-mail.com"),
    )
    ip = F.concat_ws(
        ".",
        (F.pmod(_h(seed, doc, "ip1"), F.lit(200)) + 11).cast("string"),
        F.pmod(_h(seed, doc, "ip2"), F.lit(256)).cast("string"),
        F.pmod(_h(seed, doc, "ip3"), F.lit(256)).cast("string"),
        (F.pmod(_h(seed, doc, "ip4"), F.lit(254)) + 1).cast("string"),
    )

    text = (
        F.when(kind == 0, F.concat(F.lit("Too short. "), _pick(_COMMON, _h(seed, doc, "s"))))
        .when(kind == 1, F.array_join(F.array_repeat(F.lit("• a bullet item in a wall of bullets"), 25), "\n"))
        .when(kind == 2, F.concat(good, F.array_join(F.array_repeat(F.concat(F.lit("\nThe same repeated line "), _pick(_COMMON, _h(seed, doc, "r")), F.lit(" appears again and again.")), 12), "")))
        .when(kind == 3, F.concat(good, F.lit("\nLorem ipsum dolor sit amet, consectetur adipiscing elit sed do.")))
        .when(kind == 4, F.concat(good, F.lit("\nfunction f() { return window.data; }")))
        .when(kind == 5, F.concat(good, F.lit("\nPlease enable javascript to view this page properly today.")))
        .when(kind == 6, F.concat(good, F.lit("\nContact "), email, F.lit(" from host "), ip, F.lit(" for more information and details.")))
        .when(kind == 7, german)
        .when(kind == 8, F.concat(F.lit("Prices today: "), F.array_join(F.transform(F.sequence(F.lit(0), F.lit(79)), lambda i: F.pmod(_h(seed, doc, i, "d"), F.lit(9000)).cast("string")), " "), F.lit(" .")))
        .when(kind == 9, F.array_join(F.transform(F.sequence(F.lit(0), F.lit(19)), lambda i: F.concat(F.lit("this part of the story trails off into nothing at all"), F.lit("..."))), "\n"))
        .otherwise(good)
    )

    lang = F.when(kind == 7, "de").otherwise("en")
    host = F.concat(F.lit("host-"), F.pmod(_h(seed, doc, "host"), F.lit(500)).cast("string"))
    # deliberate skew: 8% of all pages land on one hot host (north-rule skew target)
    host = F.when(F.pmod(_h(seed, doc, "hot"), F.lit(100)) < 8, F.lit("hot-host-0")).otherwise(host)
    url = F.concat(F.lit("https://"), host, F.lit(".example.com/page/"), doc.cast("string"))
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(EPOCH).cast("timestamp")) + F.pmod(_h(seed, doc, "ts"), F.lit(86400 * 30))
    )
    html = F.encode(F.concat(F.lit("<html><body><p>"), text, F.lit("</p></body></html>")), "UTF-8")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
