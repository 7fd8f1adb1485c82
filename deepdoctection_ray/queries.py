"""The engine's query catalog: one entry per operator/pipeline (SURVEY.md §2),
each with a DuckDB oracle where the semantics are SQL-expressible.

Every callable takes ``sf_dir`` (a directory of the driver's parquet tables)
and returns a Dataset / pyarrow Table / pandas DataFrame. Column names match
the oracle SQL exactly; float aggregates are rounded on both sides so
summation order can't flip the value hash.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .functions.aggregates import grouped_sums
from .functions.joins import broadcast_join, semi_join
from .stages import dedup as dd
from .stages import similarity as sim
from .stages import text_stats as ts
from .stages.extract import TurnExtractor

# --------------------------------------------------------------------- utils


def _t(sf_dir: str, name: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _round(df: pd.DataFrame, cols: dict[str, int]) -> pd.DataFrame:
    for c, nd in cols.items():
        df[c] = df[c].astype(float).round(nd)
    return df


# ------------------------------------------------------------ relational core


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: filtered scan → grouped sums/averages.

    Prunes to 7 columns at the read, filters vectorized, pre-aggregates per
    batch; the shuffle carries one row per (flag, status, batch).
    """
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))
    ds = _t(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    )

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc_price = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), batch["l_tax"]))
        batch = batch.append_column("disc_price", disc_price)
        batch = batch.append_column("charge", charge)
        return batch.select(
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "disc_price", "charge"]
        )

    agg = grouped_sums(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        sum_columns=["l_quantity", "l_extendedprice", "disc_price", "charge", "l_discount"],
        count_alias="count_order",
    )
    df = agg.to_pandas()
    df["avg_qty"] = df["sum_l_quantity"] / df["count_order"]
    df["avg_price"] = df["sum_l_extendedprice"] / df["count_order"]
    df["avg_disc"] = df["sum_l_discount"] / df["count_order"]
    df = df.rename(
        columns={
            "sum_l_quantity": "sum_qty",
            "sum_l_extendedprice": "sum_base_price",
            "sum_disc_price": "sum_disc_price",
            "sum_charge": "sum_charge",
        }
    ).drop(columns=["sum_l_discount"])
    df = _round(df, {"sum_qty": 4, "sum_base_price": 4, "sum_disc_price": 4, "sum_charge": 4,
                     "avg_qty": 6, "avg_price": 6, "avg_disc": 6})
    cols = ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price",
            "sum_charge", "avg_qty", "avg_price", "avg_disc", "count_order"]
    return df[cols].sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                    AS sum_qty,
       round(sum(l_extendedprice), 4)                               AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)            AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 6)                                    AS avg_qty,
       round(avg(l_extendedprice), 6)                               AS avg_price,
       round(avg(l_discount), 6)                                    AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape: two broadcast joins (dimension side small) + grouped
    revenue + deterministic top-10."""
    cut = pd.Timestamp("1998-01-01")
    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust_keys = [
        r["c_custkey"]
        for r in cust.map_batches(
            lambda b: b.filter(pc.equal(b["c_mktsegment"], pa.scalar("BUILDING"))),
            batch_format="pyarrow",
        ).take_all()
    ]
    orders = semi_join(
        _t(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]),
        cust_keys,
        "o_custkey",
    ).map_batches(
        lambda b: b.filter(pc.less(b["o_orderdate"], pa.scalar(cut, pa.timestamp("us")))),
        batch_format="pyarrow",
    )
    order_rows = orders.take_all()  # small after both filters; broadcast
    order_map = {
        r["o_orderkey"]: {"o_orderdate": r["o_orderdate"], "o_orderpriority": r["o_orderpriority"]}
        for r in order_rows
    }
    line = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], pa.scalar(cut, pa.timestamp("us"))))
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})

    joined = semi_join(
        line.map_batches(prep, batch_format="pyarrow"), list(order_map), "l_orderkey"
    )
    agg = grouped_sums(joined, ["l_orderkey"], ["rev"], count_alias=None).to_pandas()
    agg["revenue"] = agg["sum_rev"].round(4)
    agg["o_orderdate"] = agg["l_orderkey"].map(lambda k: order_map[k]["o_orderdate"])
    agg["o_orderpriority"] = agg["l_orderkey"].map(lambda k: order_map[k]["o_orderpriority"])
    agg = agg.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return agg[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]].reset_index(drop=True)


Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(sf_dir: str) -> pd.DataFrame:
    """Star join through broadcast dimensions: lineitem → supplier → nation →
    region, revenue per region name."""
    region = {r["r_regionkey"]: r["r_name"] for r in _t(sf_dir, "region").take_all()}
    nation = {
        n["n_nationkey"]: region[n["n_regionkey"]] for n in _t(sf_dir, "nation").take_all()
    }
    supplier = {
        s["s_suppkey"]: {"r_name": nation[s["s_nationkey"]]}
        for s in _t(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).take_all()
    }
    line = _t(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def prep(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"l_suppkey": batch["l_suppkey"], "rev": rev})

    joined = broadcast_join(
        line.map_batches(prep, batch_format="pyarrow"),
        supplier,
        "l_suppkey",
        {"r_name": pa.string()},
    )
    df = grouped_sums(joined, ["r_name"], ["rev"], count_alias="n_items").to_pandas()
    df["revenue"] = df["sum_rev"].round(4)
    return (
        df[["r_name", "revenue", "n_items"]]
        .sort_values("r_name")
        .reset_index(drop=True)
    )


Q5_SQL = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q_orders_by_segment(sf_dir: str) -> pd.DataFrame:
    cust = {
        r["c_custkey"]: {"c_mktsegment": r["c_mktsegment"]}
        for r in _t(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).take_all()
    }
    orders = _t(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, cust, "o_custkey", {"c_mktsegment": pa.string()})
    df = grouped_sums(joined, ["c_mktsegment"], ["o_totalprice"], count_alias="n_orders").to_pandas()
    df["total_price"] = df["sum_o_totalprice"].round(4)
    return df[["c_mktsegment", "n_orders", "total_price"]].sort_values("c_mktsegment").reset_index(drop=True)


Q_SEGMENT_SQL = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 4) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_top10_orders(sf_dir: str) -> ray.data.Dataset:
    return (
        _t(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


Q_TOP10_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_distinct_status(sf_dir: str) -> pa.Table:
    vals = _t(sf_dir, "orders", columns=["o_orderstatus"]).unique("o_orderstatus")
    return pa.table({"o_orderstatus": pa.array(sorted(vals), pa.string())})


Q_DISTINCT_SQL = "SELECT DISTINCT o_orderstatus FROM orders"


def q_events_by_type(sf_dir: str) -> pd.DataFrame:
    ev = _t(sf_dir, "events", columns=["event_type", "value"])
    df = grouped_sums(ev, ["event_type"], ["value"], count_alias="n").to_pandas()
    df["mean_value"] = (df["sum_value"] / df["n"]).round(6)
    df["sum_value"] = df["sum_value"].round(4)
    return df[["event_type", "n", "sum_value", "mean_value"]].sort_values("event_type").reset_index(drop=True)


Q_EVENTS_TYPE_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value,
       round(avg(value), 6) AS mean_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_events_sessionize(sf_dir: str, gap_seconds: int = 1800) -> ray.data.Dataset:
    """Session windows per user (gap > 30 min starts a new session) —
    the ordered-log groupby shape; the per-group sort is the windowing's
    partitioning assumption (key = user_id)."""
    ev = _t(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds()
        n_sessions = int((gaps > gap_seconds).sum()) + 1
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [n_sessions], "n_events": [len(g)]}
        )

    return ev.groupby("user_id").map_groups(sessions, batch_format="pandas")


Q_SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS brk
  FROM events
)
SELECT user_id, CAST(sum(brk) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events
FROM gaps GROUP BY user_id
"""


def q_events_asof(sf_dir: str) -> ray.data.Dataset:
    """As-of join: for each purchase event, the latest click of the same user
    at or before it (bucketed ``merge_asof`` — an operator Ray Data lacks)."""
    from .functions.joins import asof_join

    ev = _t(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    purchases = ev.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], pa.scalar("purchase"))),
        batch_format="pyarrow",
    )
    clicks = ev.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], pa.scalar("click"))),
        batch_format="pyarrow",
    )
    joined = asof_join(purchases, clicks, "user_id", "ts", ["event_id", "value"])
    return joined.select_columns(["event_id", "user_id", "ts", "event_id_right", "value_right"])


Q_ASOF_SQL = """
SELECT l.event_id, l.user_id, l.ts,
       r.event_id AS event_id_right, r.value AS value_right
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_approx_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """HLL approximate distinct users per event type (mergeable sketch; one
    4-KB register array per batch crosses the shuffle, never the raw keys)."""
    from .stages.sketches import approx_distinct

    ev = _t(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_distinct(ev, "user_id", by="event_type")


def q_events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling one-hour window counts per event type."""
    ev = _t(sf_dir, "events", columns=["ts", "event_type"])

    def add_hour(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table({"hour": hour, "event_type": batch["event_type"]})

    return grouped_sums(
        ev.map_batches(add_hour, batch_format="pyarrow"),
        ["hour", "event_type"],
        [],
        count_alias="n",
    )


Q_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
FROM events GROUP BY 1, 2
"""


# ----------------------------------------------------------------- documents


def q_doc_tokens(sf_dir: str) -> ray.data.Dataset:
    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(ts.token_stats, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_pieces"]
    )


Q_DOC_TOKENS_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_pieces
FROM documents
"""


def q_doc_quality(sf_dir: str) -> ray.data.Dataset:
    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(ts.quality_stats, batch_format="pyarrow").select_columns(
        ["doc_id", "n_chars_text", "n_tokens", "n_punct", "punct_ratio"]
    )


Q_DOC_QUALITY_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT)                                   AS n_chars_text,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)  AS n_tokens,
       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
       round(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
             / greatest(length(text), 1)::DOUBLE, 6)                  AS punct_ratio
FROM documents
"""


def q_quality_filter(sf_dir: str) -> ray.data.Dataset:
    """Quality filtering: keep documents passing token-count and punctuation
    thresholds — the filter stage every training-data pipeline runs after
    scoring. Vectorized RE2 predicate, no row crosses the stage unfiltered."""
    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def keep(batch: pa.Table) -> pa.Table:
        scored = ts.quality_stats(batch)
        mask = pc.and_(
            pc.greater_equal(scored["n_tokens"], pa.scalar(5, pa.int64())),
            pc.less_equal(scored["punct_ratio"], pa.scalar(0.2)),
        )
        return scored.filter(mask).select(["doc_id", "n_tokens"])

    return docs.map_batches(keep, batch_format="pyarrow")


Q_QUALITY_FILTER_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
FROM documents
WHERE len(regexp_extract_all(text, '[A-Za-z0-9]+')) >= 5
  AND round(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
            / greatest(length(text), 1)::DOUBLE, 6) <= 0.2
"""


def q_doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(ts.fingerprint, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"]
    )


Q_DOC_FP_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def q_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return dd.dedup_exact(docs, "text", "doc_id")


Q_DEDUP_EXACT_SQL = """
SELECT md5(text) AS dedup_key, min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY text
"""


def q_doc_stats_by_source(sf_dir: str) -> pd.DataFrame:
    from .functions.metrics import column_mean_std

    docs = _t(sf_dir, "documents", columns=["source", "n_chars"])
    df = column_mean_std(docs, "n_chars", by="source").to_pandas()
    df["mean"] = df["mean"].round(6)
    df["std"] = df["std"].round(6)
    return df.rename(columns={"mean": "mean_chars", "std": "std_chars"}).sort_values("source").reset_index(drop=True)


Q_DOC_STATS_SQL = """
SELECT source, round(avg(n_chars), 6) AS mean_chars,
       round(stddev_pop(n_chars), 6) AS std_chars, count(*) AS n
FROM documents GROUP BY source ORDER BY source
"""


def q_extract_documents(sf_dir: str) -> ray.data.Dataset:
    """The extraction stage over the documents table (plain payloads)."""
    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(
        TurnExtractor, batch_format="pyarrow", concurrency=(1, 4), batch_size=1024
    )
    return out.select_columns(["doc_id", "extracted_text"])


Q_EXTRACT_DOCS_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(text, '\s+', ' ', 'g')) AS extracted_text
FROM documents
"""


def q_lang_id(sf_dir: str) -> ray.data.Dataset:
    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(ts.LanguageId, batch_format="pyarrow", concurrency=(1, 4)).select_columns(
        ["doc_id", "lang_pred", "lang_score"]
    )


def q_rolling_fingerprint(sf_dir: str) -> ray.data.Dataset:
    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(ts.rolling_fingerprint, batch_format="pyarrow").select_columns(
        ["doc_id", "rolling_fp"]
    )


# -------------------------------------------------------- dedup / similarity


def q_dedup_minhash(sf_dir: str) -> ray.data.Dataset:
    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return dd.dedup_minhash(docs, "text", "doc_id", threshold=0.5)


def q_dedup_simhash(sf_dir: str) -> ray.data.Dataset:
    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return dd.dedup_simhash(docs, "text", "doc_id", max_hamming=8)


def q_dedup_embedding(sf_dir: str) -> ray.data.Dataset:
    emb = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dd.dedup_embedding_cosine(emb, "embedding", "vec_id", threshold=0.9)


def q_knn_cosine(sf_dir: str) -> ray.data.Dataset:
    emb = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return sim.knn_brute(emb, query_ids=[0, 1, 2], k=10)


Q_KNN_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN (0, 1, 2)
)
SELECT q.query_id, e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cosine
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> q.query_id
QUALIFY row_number() OVER (
  PARTITION BY q.query_id
  ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC, e.vec_id
) <= 10
"""


def q_knn_lsh(sf_dir: str) -> ray.data.Dataset:
    emb = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return sim.knn_lsh(emb, query_ids=[0, 1, 2], k=10, planes=6)


# ----------------------------------------------------------- extraction demo


def _transcripts_dir() -> str:
    from .synth import write_transcripts

    return write_transcripts("/tmp/ddray_transcripts_small", n_convs=60, seed=42, hot_factor=10)


def q_extract_transcripts(sf_dir: str) -> ray.data.Dataset:
    """Flagship extraction over the synthetic transcript table (the sf tables
    carry no transcripts; the input is synthesized deterministically)."""
    from .pipelines.extraction import extract_turns, read_transcripts

    ds = read_transcripts(_transcripts_dir())
    out = extract_turns(ds, concurrency=(1, 4), batch_size=512)
    return out.select_columns(["conv_id", "turn_idx", "payload_kind", "extracted_text"])


def q_token_classes(sf_dir: str) -> ray.data.Dataset:
    """Token classification counts per document (LMTokenClassifier analog,
    rule-based): number tokens vs total tokens."""
    from .stages.classify import TokenClassifier

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(TurnExtractor, batch_format="pyarrow", concurrency=(1, 4))
    out = out.map_batches(TokenClassifier, batch_format="pyarrow", concurrency=(1, 4))

    def counts(batch: pa.Table) -> pa.Table:
        n_tok, n_num = [], []
        for classes in batch["token_classes"].to_pylist():
            classes = classes or []
            n_tok.append(len(classes))
            n_num.append(sum(1 for c in classes if c == "number"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_number": pa.array(n_num, pa.int64()),
            }
        )

    return out.map_batches(counts, batch_format="pyarrow")


Q_TOKEN_CLASSES_SQL = r"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
                            x -> regexp_full_match(x, '[0-9]+([.,][0-9]+)*'))) AS BIGINT) AS n_number
FROM documents
"""


def q_doc_type(sf_dir: str) -> ray.data.Dataset:
    """Sequence classification (document type) over the layout-doc corpus."""
    from .stages.classify import SequenceClassifier
    from .synth import make_layout_docs

    ds = ray.data.from_arrow(make_layout_docs(300, seed=42))
    out = ds.map_batches(TurnExtractor, batch_format="pyarrow", concurrency=(1, 4))
    out = out.map_batches(SequenceClassifier, batch_format="pyarrow", concurrency=(1, 2))
    return out.select_columns(["doc_id", "doc_type"])


def q_table_segment(sf_dir: str) -> ray.data.Dataset:
    """Table segmentation: deterministic cell grids → (row, col) assignment →
    CSV text per table."""
    from .kernels.table_segment import segment_table_payload
    from .synth import make_table_docs

    ds = ray.data.from_arrow(make_table_docs(200, seed=42))

    def segment(batch: pa.Table) -> pa.Table:
        import json as _json

        import numpy as np

        ids, n_rows, n_cols, csvs = [], [], [], []
        for doc_id, payload in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            doc = _json.loads(payload)
            boxes = np.array(
                [[c["x0"], c["top"], c["x1"], c["bottom"]] for c in doc["cells"]], dtype=np.float64
            )
            res = segment_table_payload(boxes, [c["text"] for c in doc["cells"]])
            ids.append(doc_id)
            n_rows.append(res["n_rows"])
            n_cols.append(res["n_cols"])
            csvs.append(res["csv"])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_rows": pa.array(n_rows, pa.int64()),
                "n_cols": pa.array(n_cols, pa.int64()),
                "csv": pa.array(csvs, pa.string()),
            }
        )

    return ds.map_batches(segment, batch_format="pyarrow")


def q_extract_layout(sf_dir: str) -> ray.data.Dataset:
    """Full layout-pipeline composition (NMS → ioa matching → residual lines →
    reading order) over a deterministic detector-output table."""
    from .synth import make_layout_docs

    ds = ray.data.from_arrow(make_layout_docs(300, seed=42))
    out = ds.map_batches(TurnExtractor, batch_format="pyarrow", concurrency=(1, 4))
    return out.select_columns(["doc_id", "payload_kind", "extracted_text"])


def q_assemble_conversations(sf_dir: str) -> ray.data.Dataset:
    """Conversation-level document assembly: turns sorted per conv_id and
    joined with role prefixes (the cross-record Page.text analog)."""
    from .pipelines.extraction import assemble_conversations, extract_turns, read_transcripts

    ds = read_transcripts(_transcripts_dir())
    out = extract_turns(ds, concurrency=(1, 4), batch_size=512)
    return assemble_conversations(out)


def q_conv_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-conversation stats over extraction output (groupby conv_id)."""
    from .pipelines.extraction import extract_turns, read_transcripts

    ds = read_transcripts(_transcripts_dir())
    out = extract_turns(ds, concurrency=(1, 4), batch_size=512)

    def add_len(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "n_chars": pc.cast(pc.utf8_length(batch["extracted_text"]), pa.int64()),
            }
        )

    return grouped_sums(
        out.map_batches(add_len, batch_format="pyarrow"), ["conv_id"], ["n_chars"], count_alias="n_turns"
    )


# -------------------------------------------------------------------- export


def build_queries() -> dict:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_region_revenue": q5_region_revenue,
        "q_orders_by_segment": q_orders_by_segment,
        "q_top10_orders": q_top10_orders,
        "q_distinct_status": q_distinct_status,
        "q_events_by_type": q_events_by_type,
        "q_events_sessionize": q_events_sessionize,
        "q_events_hourly": q_events_hourly,
        "q_events_asof": q_events_asof,
        "q_approx_distinct_users": q_approx_distinct_users,
        "q_doc_tokens": q_doc_tokens,
        "q_doc_quality": q_doc_quality,
        "q_quality_filter": q_quality_filter,
        "q_doc_fingerprint": q_doc_fingerprint,
        "q_dedup_exact": q_dedup_exact,
        "q_doc_stats_by_source": q_doc_stats_by_source,
        "q_extract_documents": q_extract_documents,
        "q_lang_id": q_lang_id,
        "q_rolling_fingerprint": q_rolling_fingerprint,
        "q_dedup_minhash": q_dedup_minhash,
        "q_dedup_simhash": q_dedup_simhash,
        "q_dedup_embedding": q_dedup_embedding,
        "q_knn_cosine": q_knn_cosine,
        "q_knn_lsh": q_knn_lsh,
        "q_extract_transcripts": q_extract_transcripts,
        "q_extract_layout": q_extract_layout,
        "q_conv_stats": q_conv_stats,
        "q_assemble_conversations": q_assemble_conversations,
        "q_token_classes": q_token_classes,
        "q_doc_type": q_doc_type,
        "q_table_segment": q_table_segment,
    }


def build_oracle_sql() -> dict:
    return {
        "q1_pricing_summary": Q1_SQL,
        "q3_shipping_priority": Q3_SQL,
        "q5_region_revenue": Q5_SQL,
        "q_orders_by_segment": Q_SEGMENT_SQL,
        "q_top10_orders": Q_TOP10_SQL,
        "q_distinct_status": Q_DISTINCT_SQL,
        "q_events_by_type": Q_EVENTS_TYPE_SQL,
        "q_events_sessionize": Q_SESSIONIZE_SQL,
        "q_events_hourly": Q_HOURLY_SQL,
        "q_events_asof": Q_ASOF_SQL,
        "q_doc_tokens": Q_DOC_TOKENS_SQL,
        "q_doc_quality": Q_DOC_QUALITY_SQL,
        "q_quality_filter": Q_QUALITY_FILTER_SQL,
        "q_doc_fingerprint": Q_DOC_FP_SQL,
        "q_dedup_exact": Q_DEDUP_EXACT_SQL,
        "q_doc_stats_by_source": Q_DOC_STATS_SQL,
        "q_extract_documents": Q_EXTRACT_DOCS_SQL,
        "q_knn_cosine": Q_KNN_SQL,
        "q_token_classes": Q_TOKEN_CLASSES_SQL,
        # q_lang_id / q_rolling_fingerprint / dedup approx / lsh / transcripts:
        # non-SQL-expressible → rows-only check
    }
