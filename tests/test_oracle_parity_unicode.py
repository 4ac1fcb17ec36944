"""Cross-engine parity on UNICODE documents, for every document-table
operator. The synthetic corpus is pure ASCII, so it cannot catch
byte-vs-char or codepoint-vs-byte divergences in the portable char hash,
shingling, simhash ballots, fingerprints or the multimodal byte oracle —
this sweep infuses multi-byte scripts (umlauts, CJK, Cyrillic, emoji) into
the documents table and requires every gated document operator to stay
hash-identical between Spark and DuckDB. (The sibling f32 catch: the
multimodal oracle once diverged on byte 0xF0 via DuckDB's FLOAT-width
multiply — this class of sweep is what finds those.)"""

import duckdb
import pytest

from dygiepp_spark.plans import cache
from dygiepp_spark.registry import QUERIES
from dygiepp_spark.tables import TABLE_NAMES

DOC_QUERIES = [
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "near_dup_pairs",
    "lsh_bucket_stats",
    "simhash_values",
    "hamming_near_pairs",
    "lang_id_predict",
    "quality_scores",
    "token_counts",
    "doc_fingerprints",
    "binary_metadata",
    "multimodal_decode_check",
    "frame_sample_check",
]

UNICODE_TEXTS = [
    "héllo wörld tschüß",
    "日本語 テキスト 解析",
    "🚀 emoji test 🎉 done",
    "mixed ascii 日本 and ünïcode",
    "русский текст пример",
]


@pytest.fixture(scope="module")
def unicode_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("unicode_sf"))
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = src.limit(40).toPandas()
    for i in range(len(pdf)):
        if i % 3 == 0:
            pdf.loc[i, "text"] = (
                UNICODE_TEXTS[i % len(UNICODE_TEXTS)]
                + " "
                + str(pdf.loc[i, "text"])[:40]
            )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{d}/documents.parquet")
    for t in TABLE_NAMES:
        if t != "documents":
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").coalesce(
                1
            ).write.parquet(f"{d}/{t}.parquet")
    return d


@pytest.fixture(scope="module")
def unicode_con(unicode_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{unicode_dir}/{t}.parquet/*.parquet'"
        )
    return con


def test_document_operators_are_unicode_safe(spark, unicode_dir, unicode_con):
    failures = {}
    for name in DOC_QUERIES:
        spec = QUERIES[name]
        try:
            with cache.scoped():
                sdf = spec.build(spark, unicode_dir).toPandas()
            odf = unicode_con.execute(spec.sql).df()
        except Exception as ex:  # noqa: BLE001 — collected, reported below
            failures[name] = f"raised {type(ex).__name__}: {str(ex)[:120]}"
            continue
        cols = sorted(sdf.columns)
        a = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
        b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
        if len(a) != len(b):
            failures[name] = f"rows {len(a)} != {len(b)}"
        elif not a.equals(b):
            diff = [(c, list(a[c])[:3], list(b[c])[:3]) for c in cols if not a[c].equals(b[c])]
            failures[name] = f"values differ: {str(diff)[:160]}"
    assert not failures, "\n".join(f"{k}: {v}" for k, v in sorted(failures.items()))
