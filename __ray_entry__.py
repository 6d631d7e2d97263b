"""Driver contract for the Ray-Data-native extraction engine.

``entry()`` — flagship main-content extraction over sf0.001 (documents
wrapped into Common-Crawl-style pages, then segmented/classified/
normalized by the density extractor actor stage).

``queries()`` — one entry per implemented operator family from
SURVEY.md §2 + the training-data-pipeline additions (dedup, similarity,
text analysis, multimodal plumbing).

``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
query, with matching output column names.  Non-SQL-expressible ops
(LSH dedup, IVF ANN, extraction itself, media decode) are rows-only.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import html as _html
from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: wrap ``documents``
    rows into the pages shape (url, html, text) and run the density
    extraction stage; returns the extracted Dataset."""
    import pyarrow as pa
    import ray.data as rd

    from occular_ocr_ray.pipelines.flagship import extract_dataset

    ds = rd.read_parquet(f"{SF0001}/documents.parquet", columns=["doc_id", "text", "source"])

    def to_pages(batch: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for did, text, src in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["source"].to_pylist(),
        ):
            urls.append(f"https://{src}.example/doc/{did}")
            htmls.append(
                (
                    "<html><head><title>d</title></head><body>"
                    '<nav><ul><li><a href="/">home</a></li></ul></nav>'
                    f"<main><article><p>{_html.escape(text)}</p></article></main>"
                    "<footer><p>footer</p></footer></body></html>"
                ).encode("utf-8")
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([None] * len(urls), pa.string()),
            }
        )

    pages = ds.map_batches(to_pages, batch_format="pyarrow")
    return extract_dataset(pages, batch_size=64)


def queries() -> dict[str, Callable[[str], Any]]:
    from occular_ocr_ray.pipelines import relational as R

    return {
        # relational / TPC-H-flavoured (SURVEY.md §2.4-§2.6 analogs)
        "q1_pricing_summary": R.q1_pricing_summary,
        "revenue_by_region": R.revenue_by_region,
        "segment_order_stats": R.segment_order_stats,
        "orders_join_priority": R.orders_join_priority,
        "orders_join_priority_bucketed": R.orders_join_priority_bucketed,
        "top_orders": R.top_orders,
        "largest_docs": R.largest_docs,
        "events_type_stats": R.events_type_stats,
        "filter_project_revenue": R.filter_project_revenue,
        "distinct_segments": R.distinct_segments,
        # events / windows / set ops / as-of
        "events_hourly": R.events_hourly,
        "events_sliding": R.events_sliding,
        "approx_distinct_users": R.approx_distinct_users,
        "user_sessions": R.user_sessions,
        "asof_prior_view": R.asof_prior_view,
        "events_union": R.events_union,
        "sample_hash": R.sample_hash,
        # documents / text scalar fns (SURVEY.md §2.7)
        "docs_lang_stats": R.docs_lang_stats,
        "token_counts": R.token_counts,
        "doc_fingerprints": R.doc_fingerprints,
        "dedup_exact": R.dedup_exact,
        # embeddings / similarity
        "knn_bruteforce": R.knn_bruteforce_q,
        "knn_ivf": R.knn_ivf_q,
        "embedding_neardup": R.embedding_neardup_q,
        # flagship extraction + text analysis (rows-only)
        "extract_pages": R.extract_pages_q,
        "quality_scores": R.quality_scores,
        "langid_predictions": R.langid_predictions,
        # near-dup dedup family (rows-only)
        "minhash_pairs": R.minhash_pairs_q,
        "minhash_dedup_keep": R.minhash_dedup_keep_q,
        "simhash_pairs": R.simhash_pairs_q,
        "ngram_jaccard": R.ngram_jaccard_q,
        # multimodal plumbing (rows-only)
        "media_decode": R.media_decode_q,
        # end-to-end corpus pipeline (extract → quality → dedup; rows-only)
        "corpus_pipeline": _corpus_pipeline,
    }


def _corpus_pipeline(sf_dir: str) -> Any:
    from occular_ocr_ray.pipelines.training_data import corpus_pipeline_q

    return corpus_pipeline_q(sf_dir)


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)                          AS sum_qty,
                   round(sum(l_extendedprice), 2)                     AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
                   round(sum(l_quantity) / count(*), 4)               AS avg_qty,
                   round(sum(l_discount) / count(*), 4)               AS avg_disc,
                   count(*)                                           AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_region": """
            SELECT r_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN region   ON r_regionkey = n_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "segment_order_stats": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_revenue
            FROM orders JOIN customer ON c_custkey = o_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "orders_join_priority": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "orders_join_priority_bucketed": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "largest_docs": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 10
        """,
        "events_type_stats": """
            SELECT event_type,
                   count(*) AS n_events,
                   round(avg(value), 4) AS avg_value,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 10
        """,
        "filter_project_revenue": """
            SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice * (1 - l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.05
            ORDER BY l_orderkey, l_linenumber
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
        """,
        "events_hourly": """
            SELECT event_type,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "asof_prior_view": """
            SELECT e.event_id, v.ts AS prior_view_ts
            FROM (SELECT * FROM events WHERE event_type = 'click') e
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON e.user_id = v.user_id AND v.ts < e.ts
            ORDER BY e.event_id
        """,
        "events_union": """
            SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT event_id, event_type FROM events WHERE value > 900
            ORDER BY event_id, event_type
        """,
        "sample_hash": """
            SELECT doc_id FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')
            ORDER BY doc_id
        """,
        "events_sliding": """
            WITH w AS (
              SELECT event_type, value,
                     make_timestamp(CAST((floor(epoch(ts)/1800)*1800 - 1800*k.k) * 1000000 AS BIGINT)) AS wstart,
                     ts
              FROM events, (SELECT 0 AS k UNION ALL SELECT 1) k
            )
            SELECT event_type, strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM w
            WHERE epoch(ts) - epoch(wstart) >= 0 AND epoch(ts) - epoch(wstart) < 3600
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "user_sessions": """
            WITH marks AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_start
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, count(*) AS n_sessions
            FROM marks WHERE is_start = 1
            GROUP BY user_id ORDER BY user_id
        """,
        "docs_lang_stats": """
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(CAST(sum(n_chars) AS DOUBLE) / count(*), 2) AS avg_chars
            FROM documents
            GROUP BY lang ORDER BY lang
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
            FROM documents ORDER BY doc_id
        """,
        "doc_fingerprints": """
            SELECT doc_id, md5(text) AS fp_md5 FROM documents ORDER BY doc_id
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY md5(text) ORDER BY doc_id
        """,
        "knn_bruteforce": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 5
            )
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   CAST(row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                                e.vec_id
                   ) AS BIGINT) AS rank
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
            QUALIFY rank <= 5
            ORDER BY query_id, rank
        """,
    }
