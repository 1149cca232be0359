"""Unicode portability boundary of the cross-engine oracle twins.

The portable-hash twins (queries/dedup_oracle.py) hash raw token BYTES
after ``lower()`` — so they are cross-engine exact only where the JVM's
and DuckDB's (utf8proc) case folding agree. Probing adversarial scripts
showed they agree on Greek (incl. final sigma), Cyrillic, CJK, emoji,
ligatures, and non-ASCII whitespace — and disagree on exactly one known
case: Turkish dotted capital İ (U+0130), which Java lowercases to
``i + U+0307`` (combining dot above) while DuckDB maps it differently.

Both halves are pinned here: the agreement set (so an engine upgrade
that silently breaks, say, CJK handling fails loudly) and the known
divergence (so if a future DuckDB/JVM aligns on U+0130 we find out and
can widen the documented domain).
"""

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoop_copier_spark.queries import REGISTRY
from hadoop_copier_spark.testing import compare

TWINS = [
    "xh_text_quality",
    "xh_simhash",
    "xh_doc_fingerprint",
    "xh_repetition",
    "xh_minhash_lsh_pairs",
]

PORTABLE_TEXTS = [
    "Hello WÖRLD straße ÉCOLE",
    "ΑΒΓ αβγ ΣΊΓΜΑ τέλος Σ",  # greek incl. the final-sigma folding rule
    "ПРИВЕТ мир Ёлка",
    "日本語 テキスト 中文 文本",  # lower() is identity
    "emoji 😀 🎉 mixed ASCII",
    "ﬀ ﬁ ligatures ǅungla",  # ligature chars + titlecase digraph
    "a b c",  # nbsp + em-space exercise \\s+ in both regex engines
]


def _write_docs(texts) -> str:
    tmp = tempfile.mkdtemp(prefix="hcs_unicode_")
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "lang": pa.array(["x"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, os.path.join(tmp, "documents.parquet"))
    return tmp


@pytest.fixture(scope="module")
def duck_docs():
    import duckdb

    def connect(sf_dir):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        return con

    return connect


@pytest.mark.parametrize("name", TWINS)
def test_twins_portable_across_scripts(spark, duck_docs, name):
    sf = _write_docs(PORTABLE_TEXTS)
    con = duck_docs(sf)
    q = REGISTRY[name]
    assert not compare(q.fn, q.oracle, spark, sf, con=con)
    con.close()


def test_nfkc_casefold_corpus_closes_turkish_divergence(spark, duck_docs):
    """VERDICT r10 #6: the declared-correct path for non-ASCII corpora —
    NFKC+casefold normalization applied ahead of the twins. On the
    normalized corpus the byte-level twins must be cross-engine EXACT,
    including the U+0130 case that diverges raw (next test): casefolded
    text has no case left to fold, so lower() is identity in both
    engines, and NFKC collapses ligatures/fullwidth forms first."""
    import unicodedata

    raw = [
        "İstanbul ı I i",          # the documented raw divergence
        "ẞ STRASSE ﬁn ＦＵＬＬ",   # capital sharp-S, ligature, fullwidth
        "ΑΒΓ ΣΊΓΜΑ τέλος Σ",
    ]
    norm = [unicodedata.normalize("NFKC", t).casefold() for t in raw]
    sf = _write_docs(norm)
    con = duck_docs(sf)
    diverged = [
        name
        for name in ("xh_simhash", "xh_doc_fingerprint", "xh_text_quality")
        if compare(REGISTRY[name].fn, REGISTRY[name].oracle, spark, sf, con=con)
    ]
    con.close()
    assert diverged == [], diverged


def test_with_tokens_normalize_switch_matches_python_reference(spark):
    """The in-engine switch (_with_tokens(normalize=True) /
    nfkc_casefold) must tokenize a RAW corpus exactly as Python's
    unicodedata NFKC + str.casefold reference does — so normalizing
    inside the engine and pre-normalizing the corpus are the same
    declared-correct path."""
    import re
    import unicodedata

    from hadoop_copier_spark.queries.dedup_oracle import _with_tokens

    raw = ["İstanbul ı I i", "ẞ STRASSE ﬁn ＦＵＬＬ", "", None]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, t) for i, t in enumerate(raw)], 1
        ),
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["tk"]
        for r in _with_tokens(df, repartition=False, normalize=True).collect()
    }
    for i, t in enumerate(raw):
        if t is None:
            assert got[i] is None
            continue
        n = unicodedata.normalize("NFKC", t).casefold()
        # mirror the engine tokenizer: JVM \s+ is ASCII whitespace, and
        # lower() after casefold is identity on these scripts
        expect = [w for w in re.split("[ \\t\\n\\x0b\\f\\r]+", n.lower()) if w]
        assert got[i] == expect, (i, got[i], expect)


def test_turkish_dotted_i_is_the_known_divergence(spark, duck_docs):
    """U+0130 case folding differs between the JVM and utf8proc: the
    byte-level twins (simhash / fingerprint) MUST diverge there today.
    If this test ever fails, the engines aligned — update the module
    docstring and fold İ into PORTABLE_TEXTS."""
    sf = _write_docs(["İstanbul ı I i"])
    con = duck_docs(sf)
    diverged = [
        name
        for name in ("xh_simhash", "xh_doc_fingerprint")
        if compare(REGISTRY[name].fn, REGISTRY[name].oracle, spark, sf, con=con)
    ]
    con.close()
    assert diverged == ["xh_simhash", "xh_doc_fingerprint"], diverged
