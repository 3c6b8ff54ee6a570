"""Pins for BPE merge learning (operators/bpe.py): a closed-form tiny
corpus where the merge sequence is hand-computable, and the
overlapping-run pathology that pins the leftmost-nonoverlapping
replace semantics the cross-engine contract depends on.
"""

from __future__ import annotations

import duckdb
import pandas as pd


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


def test_bpe_learns_the_planted_frequent_pair_first(spark, tmp_path):
    """Corpus dominated by 'ab': the first merge must be (a, b), and
    its count must equal the exact weighted pair frequency."""
    texts = ["ab ab ab ab ab cd", "ab ab cd xy"]
    out = (
        __import__(
            "cs686_big_data_p1_spark.operators.bpe", fromlist=["bpe_merges"]
        )
        .bpe_merges(spark, _write_docs(tmp_path, texts))
        .toPandas()
        .sort_values("merge_rank")
    )
    first = out.iloc[0]
    assert (first["left_sym"], first["right_sym"]) == ("a", "b")
    assert first["pair_count"] == 7  # 'ab' occurs 7 times
    # ranks are 1..N and counts never increase as merges proceed in
    # this corpus (each later merge works on rarer material)
    assert list(out["merge_rank"]) == list(range(1, len(out) + 1))


def test_bpe_overlapping_run_matches_duckdb(spark, tmp_path):
    """'aaaa' words: pair (a,a) counts 3 per word occurrence but the
    greedy leftmost-nonoverlapping rewrite merges positions (1,2) and
    (3,4) only. Spark and DuckDB must agree bit-for-bit on the whole
    merge table for this pathology — this is the replace-semantics
    contract the oracle relies on."""
    from cs686_big_data_p1_spark.operators.bpe import BPE_ORACLE, bpe_merges

    sf = _write_docs(tmp_path, ["aaaa aaaa aaaa", "aaa baab"])
    got = (
        bpe_merges(spark, sf)
        .toPandas()
        .sort_values("merge_rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(BPE_ORACLE).df().sort_values("merge_rank")
    want = want.reset_index(drop=True)
    assert got["merge_rank"].tolist() == want["merge_rank"].tolist()
    assert got["left_sym"].tolist() == want["left_sym"].tolist()
    assert got["right_sym"].tolist() == want["right_sym"].tolist()
    assert got["pair_count"].tolist() == want["pair_count"].tolist()
    # and the first merge is the run pair with the overlap-counted
    # frequency: 'aaaa' has 3 (a,a) pairs, x3 words, + 'aaa' has 2,
    # + 'baab' has 1 -> 12
    assert (got.loc[0, "left_sym"], got.loc[0, "right_sym"]) == ("a", "a")
    assert got.loc[0, "pair_count"] == 12


def test_bpe_encode_token_count_identities(spark):
    """Per-doc BPE token counts: bounded above by whitespace token
    count x max word length, below by word count (a word is >= 1
    token), and each merge can only shrink counts: n_bpe_tokens <=
    total characters per doc."""
    from pyspark.sql import functions as F

    from cs686_big_data_p1_spark.operators.bpe import bpe_encode
    from cs686_big_data_p1_spark.tables import load_table
    from tests.conftest import SF_SMALL

    got = {r.doc_id: r.n_bpe_tokens for r in bpe_encode(spark, SF_SMALL).collect()}
    base = {
        r.doc_id: (r.n_words, r.n_chars_nospace)
        for r in (
            load_table(spark, SF_SMALL, "documents")
            .where(F.length("text") > 0)
            .select(
                "doc_id",
                F.size(
                    F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
                ).alias("n_words"),
                F.length(F.regexp_replace("text", " ", "")).alias(
                    "n_chars_nospace"
                ),
            )
            .collect()
        )
    }
    assert set(got) == {d for d, (w, _) in base.items() if w > 0}
    for d, n in got.items():
        n_words, n_chars = base[d]
        assert n_words <= n <= n_chars, (d, n, base[d])
