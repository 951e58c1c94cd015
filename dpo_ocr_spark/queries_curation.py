"""Query+oracle registrations for ops.events, ops.curation and the
round-2 similarity/streaming additions.

Widens the training-data-pipeline surface: as-of join, sessionization,
exact group quantiles, eval-set decontamination, Gopher repetition
signals, deterministic training order, SemDeDup-style semantic pruning,
integer-exact TF-IDF, watermarked windowed streaming aggregation.  All
carry full DuckDB oracles (integer/bool-exact outputs;
epoch-microsecond timestamps).
"""

from __future__ import annotations

from .queries import ORACLES, QUERIES
from .session import scratch_dir as _scratch_dir
from .ops import curation as C
from .ops import events as EV
from .ops.similarity import SEMANTIC_PRUNE_ORACLE, semantic_prune


def _register(name: str, fn, sql: str | None = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


def _q_streaming_window_counts(spark, sf_dir: str):
    """Watermarked 1h-window counts drained through a real stream (append
    mode: only watermark-finalized windows appear — the oracle re-derives
    the cutoff as window_end <= max(ts) - 1h)."""
    from .streaming.stream import stream_window_counts

    tmp = _scratch_dir("stream_ev_")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.mode(
        "overwrite"
    ).parquet(tmp + "/src")
    stream_window_counts(spark, tmp + "/src", tmp + "/ckpt", "stream_win_q")
    return spark.table("stream_win_q")


STREAM_WINDOW_ORACLE = """
WITH e AS (
  SELECT epoch_us(ts) AS t_us, event_type,
         CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
), mx AS (
  SELECT max(t_us) AS m FROM e
), w AS (
  SELECT (t_us // 3600000000) * 3600000000 AS start_us, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(v) AS BIGINT) AS value_x100_sum
  FROM e GROUP BY 1, 2
)
SELECT start_us, event_type, n_events, value_x100_sum
FROM w, mx
WHERE start_us + 3600000000 <= m - 3600000000
"""

_register("asof_join", EV.asof_join, EV.ASOF_ORACLE)
_register("sessionize", EV.sessionize, EV.SESSIONIZE_ORACLE)
_register("value_quantiles", EV.value_quantiles, EV.VALUE_QUANTILES_ORACLE)
_register("decontaminate", C.decontaminate, C.DECONTAMINATE_ORACLE)
_register("repetition_stats", C.repetition_stats, C.REPETITION_ORACLE)
_register("training_order", C.training_order, C.TRAINING_ORDER_ORACLE)
_register("semantic_prune", semantic_prune, SEMANTIC_PRUNE_ORACLE)
_register("tfidf_top_terms", C.tfidf_top_terms, C.TFIDF_ORACLE)
_register("lm_bigram_score", C.lm_bigram_score, C.LM_BIGRAM_ORACLE)
_register("domain_mix", C.domain_mix, C.DOMAIN_MIX_ORACLE)
_register("url_filter", C.url_filter, C.URL_FILTER_ORACLE)
_register("chunk_documents", C.chunk_documents, C.CHUNK_ORACLE)
_register(
    "streaming_window_counts", _q_streaming_window_counts, STREAM_WINDOW_ORACLE
)


def _q_streaming_interval_join(spark, sf_dir: str):
    """Stream-stream self interval join drained through a real stream.
    Single staged file → one micro-batch → inner join emits every match,
    so the plain SQL interval join is a FULL oracle."""
    from .streaming.stream import stream_interval_join

    tmp = _scratch_dir("stream_ij_")
    spark.read.parquet(f"{sf_dir}/events.parquet").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp + "/src")
    stream_interval_join(spark, tmp + "/src", tmp + "/ckpt", "stream_ij_q")
    return spark.table("stream_ij_q")


STREAM_INTERVAL_JOIN_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type FROM events
)
SELECT a.user_id,
       a.event_id AS src_event_id,
       b.event_id AS dst_event_id,
       a.t_us AS src_us,
       b.t_us AS dst_us,
       b.event_type AS dst_type
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND b.t_us > a.t_us
 AND b.t_us <= a.t_us + 600000000
"""

_register(
    "streaming_interval_join",
    _q_streaming_interval_join,
    STREAM_INTERVAL_JOIN_ORACLE,
)


def _curated_training_oracle() -> str:
    # chain the already-registered curation_verdict oracle, then apply the
    # training_order hash/rank contract over its keepers
    verdict_sql = ORACLES["curation_verdict"]
    return f"""
WITH verd AS ({verdict_sql}),
kept AS (SELECT doc_id FROM verd WHERE keep),
h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM kept
)
SELECT doc_id, h % {C.N_SHARDS} AS shard,
       row_number() OVER (PARTITION BY h % {C.N_SHARDS} ORDER BY h, doc_id)
         AS pos
FROM h
"""


_register(
    "curated_training_set", C.curated_training_set, _curated_training_oracle()
)


def _host_cap_oracle() -> str:
    from .queries import _URL_SQL
    from .ops.textstats import HOST_CAP

    return f"""
WITH pages AS (
  SELECT {_URL_SQL} AS url FROM documents
), h AS (
  SELECT url, regexp_extract(url, '^https://([^/]+)/', 1) AS host
  FROM pages
)
SELECT url, host,
       row_number() OVER (PARTITION BY host ORDER BY md5(url), url)
         AS host_rank,
       row_number() OVER (PARTITION BY host ORDER BY md5(url), url)
         <= {HOST_CAP} AS kept
FROM h
"""


from .ops.textstats import host_cap  # noqa: E402

_register("host_cap", host_cap, _host_cap_oracle())
_register(
    "repetition_stats_exploded",
    C.repetition_stats_exploded,
    C.REPETITION_ORACLE,
)


def _incremental_dedup_oracle() -> str:
    from .ops.dedup import BATCH_MOD, MAX_GROUP, incremental_dedup  # noqa: F401
    from .queries_ops import _SH_CTE

    m = BATCH_MOD
    return f"""
WITH {_SH_CTE},
fps AS (
  SELECT doc_id,
         md5(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fp,
         doc_id % {m} = 0 AS b
  FROM documents
), exact AS (
  SELECT DISTINCT f.doc_id FROM fps f
  WHERE f.b AND EXISTS (SELECT 1 FROM fps c WHERE NOT c.b AND c.fp = f.fp)
), corp_df AS (
  SELECT shingle, COUNT(*) AS df FROM sh WHERE doc_id % {m} <> 0
  GROUP BY shingle
), inter AS (
  SELECT n.doc_id AS new_id, c.doc_id AS corp_id, COUNT(*) AS n_inter
  FROM sh n
  JOIN sh c ON n.shingle = c.shingle
  JOIN corp_df d ON d.shingle = n.shingle AND d.df <= {MAX_GROUP}
  WHERE n.doc_id % {m} = 0 AND c.doc_id % {m} <> 0
  GROUP BY 1, 2
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), scored AS (
  SELECT new_id, corp_id,
         CAST(floor(n_inter * 1000 / (sn.n + sc.n - n_inter)) AS BIGINT)
           AS j
  FROM inter
  JOIN sizes sn ON sn.doc_id = new_id
  JOIN sizes sc ON sc.doc_id = corp_id
), best AS (
  SELECT new_id AS doc_id, corp_id AS best_match_id,
         j AS best_jaccard_x1000
  FROM (SELECT *, row_number() OVER (PARTITION BY new_id
                                     ORDER BY j DESC, corp_id) AS rn
        FROM scored)
  WHERE rn = 1
)
SELECT d.doc_id,
       e.doc_id IS NOT NULL AS exact_dup,
       coalesce(b.best_jaccard_x1000 >= 300, FALSE) AS near_dup,
       b.best_match_id, b.best_jaccard_x1000
FROM documents d
LEFT JOIN exact e ON e.doc_id = d.doc_id
LEFT JOIN best b ON b.doc_id = d.doc_id
WHERE d.doc_id % {m} = 0
"""


from .ops.dedup import incremental_dedup  # noqa: E402

_register("incremental_dedup", incremental_dedup, _incremental_dedup_oracle())

_register("pii_scrub", C.pii_scrub, C.PII_ORACLE)

_register("props_extract", EV.props_extract, EV.PROPS_EXTRACT_ORACLE)


def _q_streaming_sessionize(spark, sf_dir: str):
    """Stateful streaming sessionization drained availableNow: emits the
    gap-CLOSED sessions (batch sessionize minus each user's final open
    session — re-derived exactly by the oracle)."""
    from .streaming.stream import stream_sessionize

    tmp = _scratch_dir("stream_sess_")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.mode(
        "overwrite"
    ).parquet(tmp + "/src")
    stream_sessionize(spark, tmp + "/src", tmp + "/ckpt", "stream_sess_q")
    return spark.table("stream_sess_q")


def _streaming_sessionize_oracle() -> str:
    from .ops.events import GAP_S

    return f"""
WITH base AS (
  SELECT user_id, epoch_us(ts) AS t_us FROM events
), flagged AS (
  SELECT user_id, t_us,
         CASE WHEN lag(t_us) OVER w IS NULL
                   OR t_us - lag(t_us) OVER w > {GAP_S} * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY t_us)
), sess AS (
  SELECT user_id, t_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY t_us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
), grouped AS (
  SELECT user_id, session_id,
         MIN(t_us) AS start_us, MAX(t_us) AS end_us,
         COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, start_us, end_us, n_events
FROM (SELECT *, MAX(session_id) OVER (PARTITION BY user_id) AS last_sid
      FROM grouped)
WHERE session_id <> last_sid
"""


_register(
    "streaming_sessionize",
    _q_streaming_sessionize,
    _streaming_sessionize_oracle(),
)

from .ops.pixels import IMAGE_AUTOCROP_ORACLE, image_autocrop  # noqa: E402

_register("image_autocrop", image_autocrop, IMAGE_AUTOCROP_ORACLE)
# same arithmetic oracle through the COMPRESSED codec paths: PNG is
# lossless; JPEG q92 4:2:0 quantization error never moves a border or
# gutter under the autocrop threshold (exhaustive over the id space)
_register(
    "image_autocrop_png",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="png"),
    IMAGE_AUTOCROP_ORACLE,
)
_register(
    "image_autocrop_jpeg",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="jpeg"),
    IMAGE_AUTOCROP_ORACLE,
)
# r4 codec additions through the same pixel pipeline + oracle: Adam7
# interlace is lossless; progressive decode is byte-identical to the
# baseline decode of the same image (pinned in tests/test_codecs.py)
_register(
    "image_autocrop_png_adam7",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="png_adam7"),
    IMAGE_AUTOCROP_ORACLE,
)
_register(
    "image_autocrop_jpeg_prog",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="jpeg_prog"),
    IMAGE_AUTOCROP_ORACLE,
)
# r5: the sub-byte PNG decode path (1/2/4-bit gray + palette, 16-bit) —
# the fixture is pure black/white, so 1-bit grayscale is lossless for it
# and the same arithmetic oracle applies
_register(
    "image_autocrop_png_1bit",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="png_gray1"),
    IMAGE_AUTOCROP_ORACLE,
)
# r5 JPEG long tail: 12-bit extended sequential (SOF1 + 16-bit DQT +
# 2048 level shift; x16 scaling makes the decode byte-identical to the
# baseline stream) and SOF3 lossless (Annex-H predictors; exact pixels)
_register(
    "image_autocrop_jpeg12",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="jpeg12"),
    IMAGE_AUTOCROP_ORACLE,
)
_register(
    "image_autocrop_jpeg_ll",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="jpeg_ll"),
    IMAGE_AUTOCROP_ORACLE,
)
# SOF9 arithmetic entropy coding (T.81 Annex D/F QM coder, cross-
# validated both directions against libjpeg-turbo): same quantized
# coefficients as the baseline stream -> same decoded pixels
_register(
    "image_autocrop_jpeg_arith",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="jpeg_arith"),
    IMAGE_AUTOCROP_ORACLE,
)
# SOF10 progressive arithmetic (T.81 Annex G successive approximation
# over the QM coder, cross-validated both directions against
# libjpeg-turbo): same coefficients as the baseline stream again
_register(
    "image_autocrop_jpeg_pa",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="jpeg_pa"),
    IMAGE_AUTOCROP_ORACLE,
)
# Annex J hierarchical: DHP-led pyramid (non-differential SOF0 base,
# EXP-expanded SOF5 differential refinement; encoder mirrors the
# decoder's integer reference reconstruction exactly), and the SOF3+SOF7
# lossless pyramid whose decode is bit-exact — no libjpeg cross-check
# exists (libjpeg has no hierarchical mode), so the claims rest on the
# self-roundtrip + spec pins in tests/test_codecs.py
_register(
    "image_autocrop_jpeg_hier",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="jpeg_hier"),
    IMAGE_AUTOCROP_ORACLE,
)
_register(
    "image_autocrop_jpeg_hier_ll",
    lambda spark, sf_dir: image_autocrop(spark, sf_dir, codec="jpeg_hier_ll"),
    IMAGE_AUTOCROP_ORACLE,
)


def _cluster_reps_oracle() -> str:
    from .queries_ops import _STOP_EN

    clusters_sql = ORACLES["dedup_clusters"]
    return f"""
WITH cl AS ({clusters_sql}),
q AS (
  SELECT doc_id,
         CAST(floor(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'),
                    w -> list_contains({_STOP_EN}, w))) * 1000
                    / len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')))
              AS BIGINT) AS quality_x1000
  FROM documents
), rk AS (
  SELECT c.doc_id, c.cluster_id, q.quality_x1000,
         first_value(c.doc_id) OVER (PARTITION BY c.cluster_id
                                     ORDER BY q.quality_x1000 DESC,
                                              c.doc_id) AS rep_doc_id
  FROM cl c JOIN q USING (doc_id)
)
SELECT doc_id, cluster_id, quality_x1000, rep_doc_id,
       doc_id = rep_doc_id AS is_rep
FROM rk
"""


from .ops.dedup import cluster_representatives  # noqa: E402

_register(
    "cluster_representatives", cluster_representatives, _cluster_reps_oracle()
)

_register("url_normalize", C.url_normalize, C.URL_NORMALIZE_ORACLE)

_register("unicode_normalize", C.unicode_normalize, C.UNICODE_NORMALIZE_ORACLE)

_register("cube_summary", EV.cube_summary, EV.CUBE_SUMMARY_ORACLE)

# r5 late additions: the audio/video stub in ops/multimodal.py replaced
# by REAL container decode paths (RIFF/WAVE PCM + MJPEG-in-AVI, pure
# stdlib/numpy — see ops/av.py header for the honest remaining boundary:
# compressed audio / inter-frame video codecs).  Designed-fixture exact
# oracles, BIGINT/INT-only outputs per the r5 type ban.
from .ops.av import (  # noqa: E402
    AUDIO_FEATURES_ORACLE,
    VIDEO_FRAME_SAMPLE_ORACLE,
    audio_features,
    video_frame_sample,
)

_register("audio_features", audio_features, AUDIO_FEATURES_ORACLE)
_register("video_frame_sample", video_frame_sample, VIDEO_FRAME_SAMPLE_ORACLE)


# r5 sketch layer (ops/sketches.py): fixed-size mergeable summaries for
# the operators whose exact forms carry corpus-proportional shuffle or
# state at 10^12 docs.  All outputs BIGINT/BOOL/VARCHAR-exact; the two
# approximate paths are value-checked without hashing an estimate —
# decontaminate_bloom's verify join restores exact semantics (it reuses
# the exact oracle verbatim), and gram_cardinality_hll emits the exact
# count plus an integer-math ±5% agreement flag the oracle pins TRUE.
from .ops import sketches as SKT  # noqa: E402

_register(
    "decontaminate_bloom", SKT.decontaminate_bloom, C.DECONTAMINATE_ORACLE
)

_register(
    "source_counts_cms",
    SKT.source_counts_cms,
    """
SELECT source, count(*) AS n_docs
FROM documents GROUP BY 1
""",
)

_WS_TERMS = (
    "unnest(regexp_split_to_array(regexp_replace(lower(text),"
    " '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'), ' '))"
)

_register(
    "term_topk_sketch",
    SKT.term_topk_sketch,
    f"""
WITH w AS (SELECT {_WS_TERMS} AS term FROM documents),
c AS (SELECT term, count(*) AS n FROM w GROUP BY 1)
SELECT term, n FROM c ORDER BY n DESC, term LIMIT {SKT.TOPK_K}
""",
)

_GRAMS_BY_LANG = f"""
ws AS (
  SELECT lang,
         regexp_split_to_array(
           regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'), ' ') AS w
  FROM documents
), g AS (
  SELECT lang,
         unnest(list_transform(
           generate_series(1, greatest(len(w) - {C.N_DECON - 1}, 1)),
           i -> array_to_string(w[i:i + {C.N_DECON - 1}], ' '))) AS gram
  FROM ws
)
"""

_register(
    "gram_cardinality_hll",
    SKT.gram_cardinality_hll,
    f"""
WITH {_GRAMS_BY_LANG}
SELECT lang, count(DISTINCT gram) AS n_distinct, TRUE AS est_ok
FROM g GROUP BY 1
UNION ALL
SELECT 'ALL', count(DISTINCT gram), TRUE FROM g
""",
)


# Distributed BPE tokenizer training (ops/bpe.py): 8 merge iterations of
# weighted pair counting over the distinct-word table; the DuckDB twin
# replays every data-driven iteration via materialized CTEs + scalar
# subqueries, so the full iterative computation is value-checked.
from .ops.bpe import bpe_oracle, bpe_train  # noqa: E402

_register("bpe_merges", bpe_train, bpe_oracle())
