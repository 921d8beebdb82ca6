"""S3/I4 oracle: the toplist HTML field extraction (Str1/Str2 chains)
plus the early-stop prefix (take_while), checked against a DuckDB
replay of the identical split-chain logic over the identical literal
page (SURVEY.md §7.4 — "extraction logic tested by oracle queries
even though live HTTP is not").

The page literal is built by the same rules as the reference's real
pages (otrrentetl/server/etl.py:123-159): marker-separated cells,
ratings DESC with a below-threshold row cutting the feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otrrentetl_spark.registry import register
from otrrentetl_spark.sources import scrape

_MARKER = '<td oncontextmenu="showNewTabMenu('


def _toplist_page() -> str:
    rows = [
        ("4711", "05.08.26", "sehr hoch", "http://img/a.jpg"),
        ("4712", "06.08.26", "hoch", "http://img/b.jpg"),
        ("4713", "07.08.26", "mittel", "http://img/c.jpg"),  # early-stop here
        ("4714", "08.08.26", "sehr hoch", "http://img/d.jpg"),  # ignored
    ]
    blocks = []
    for epg_id, date, rating, preview in rows:
        cells = [f"0)\">c{i}</td>" for i in range(11)]
        cells[0] = f"{epg_id},'x')\">open</td>"
        cells[3] = f"0)\">{date}</td>"
        cells[7] = f"0)\" title='Beliebtheit: {rating}'>pop</td>"
        cells[9] = f"0)\"><img src={preview} width=120></td>"
        blocks.append(f"<tr id='serchrow{epg_id}'>" + _MARKER + _MARKER.join(cells))
    return "<html><table>" + "".join(blocks) + "</table></html>"


def s3_toplist_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = scrape.pages_df(spark, iter([(0, _toplist_page())]))
    rows = scrape.toplist_rows(pages)
    kept = scrape.take_while(
        rows,
        ["start_offset", "row_idx"],
        F.col("rating").isin("sehr hoch", "hoch"),
    )
    return kept.select(
        "row_idx", "epg_id", "rating", "previewimagelink", "PartitionKey"
    )


def _sql() -> str:
    page = _toplist_page().replace("'", "''")
    marker = _MARKER.replace("'", "''")
    return f"""
    WITH pages AS (SELECT '{page}' AS html),
    blocks AS (
      SELECT i.i AS row_idx,
             list_extract(string_split(html, '<tr id=''serchrow'), i.i + 1)
               AS block
      FROM pages
      CROSS JOIN (SELECT unnest(range(1, 100)) AS i) i
      WHERE i.i + 1 <= len(string_split(html, '<tr id=''serchrow'))
    ),
    cells AS (
      SELECT row_idx, string_split(block, '{marker}') AS c FROM blocks
    ),
    fields AS (
      SELECT row_idx,
             trim(split_part(c[2], ',', 1)) AS epg_id,
             split_part(split_part(c[9], 'Beliebtheit: ', 2), chr(39), 1)
               AS rating,
             split_part(split_part(c[11], '<img src=', 2), ' width=', 1)
               AS previewimagelink,
             strftime(strptime(split_part(split_part(c[5], '>', 2), '<', 1),
                               '%d.%m.%y'), '%Y_%m_%d') AS "PartitionKey"
      FROM cells
    ),
    gated AS (
      SELECT *,
             MIN(CASE WHEN rating IN ('sehr hoch', 'hoch') THEN 1 ELSE 0 END)
               OVER (ORDER BY row_idx ROWS UNBOUNDED PRECEDING) AS ok
      FROM fields
    )
    SELECT row_idx, epg_id, rating, previewimagelink, "PartitionKey"
    FROM gated WHERE ok = 1 ORDER BY row_idx
    """


register("s3_toplist_extraction", s3_toplist_extraction, _sql())


def s1_distributed_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 at scale: executor-side URL fan-out (sources.csv_ingest.
    fetch_distributed, mapPartitions) + fully-distributed `;`-CSV
    parse (from_csv column expressions). The fetch is a deterministic
    fake server (the reference's feeds are long gone; network isn't a
    correctness concern) — the oracle replays the generated feed
    arithmetic, checking the fan-out + parse plumbing end to end.
    One URL is a dead link and must surface as a row, not an error."""
    from otrrentetl_spark.sources.csv_ingest import fetch_distributed, parse_fetched_csv

    def fake_server(url: str) -> bytes:
        k = int(url.rsplit("/", 1)[1])
        if k == 5:
            raise OSError("connection refused")
        rows = "\n".join(
            f"{k * 10 + i};v{(k * 10 + i) * 3}" for i in range(10)
        )
        return f"rec_id;val\n{rows}\n".encode()

    urls = [f"fake://feed/{k}" for k in range(8)]
    fetched = fetch_distributed(spark, urls, opener=fake_server)
    parsed = parse_fetched_csv(fetched, "rec_id int, val string", sep=";")
    return (
        parsed.groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("rec_id").alias("sum_id"),
            F.max("val").alias("max_val"),
        )
        
    )


register(
    "s1_distributed_fetch",
    s1_distributed_fetch,
    """
    WITH feed AS (
      SELECT k, k * 10 + i AS rec_id, 'v' || ((k * 10 + i) * 3) AS val
      FROM range(8) t(k) CROSS JOIN range(10) u(i)
      WHERE k <> 5
    )
    SELECT 'fake://feed/' || k AS url,
           COUNT(*) AS n_rows,
           CAST(SUM(rec_id) AS BIGINT) AS sum_id,
           MAX(val) AS max_val
    FROM feed GROUP BY k ORDER BY url
    """,
)
