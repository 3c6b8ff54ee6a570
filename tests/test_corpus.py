"""Edge-case pins for the corpus-preparation operators
(operators/corpus.py) on purpose-built fixtures the bland synthetic
documents table cannot exercise: messy text for normalization, exact
stride-multiple lengths for chunking, planted cross-doc blocks for
span dedup, and closed-form diversity values.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from tests.conftest import SF_MED, SF_SMALL


def _write_docs(tmp_path, texts):
    """Write a documents.parquet with the fixture schema."""
    pd.DataFrame(
        [
            (i, t, "en", f"src{i % 3}", len(t))
            for i, t in enumerate(texts)
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


def test_doc_chunk_covers_every_word_once_per_window(spark, tmp_path):
    """Chunk boundaries: every word appears in at least one chunk, the
    reconstruction of each chunk matches the source slice, and the
    chunk count follows the integer formula at the tricky lengths
    (< W, == W, == W+1, and an exact stride multiple)."""
    from cs686_big_data_p1_spark.operators.corpus import (
        CHUNK_STRIDE,
        CHUNK_W,
        doc_chunk,
    )

    lengths = [5, CHUNK_W, CHUNK_W + 1, CHUNK_W + 2 * CHUNK_STRIDE]
    texts = [" ".join(f"w{i}" for i in range(n)) for n in lengths]
    out = doc_chunk(spark, _write_docs(tmp_path, texts)).collect()

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, n in enumerate(lengths):
        words = texts[doc_id].split(" ")
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        if n <= CHUNK_W:
            want_chunks = 1
        else:
            want_chunks = 1 + -(-(n - CHUNK_W) // CHUNK_STRIDE)
        assert len(rows) == want_chunks, (doc_id, n)
        covered = set()
        for r in rows:
            s = r.chunk_start - 1
            assert r.chunk_text == " ".join(words[s : s + CHUNK_W])
            assert r.n_words == len(r.chunk_text.split(" "))
            covered.update(range(s, s + r.n_words))
        assert covered == set(range(n))


def test_span_dedup_finds_planted_block(spark, tmp_path):
    from cs686_big_data_p1_spark.operators.corpus import SPAN_B, span_dedup

    shared = " ".join(f"s{i}" for i in range(SPAN_B))
    texts = [
        shared + " " + " ".join(f"a{i}" for i in range(SPAN_B)),
        shared + " " + " ".join(f"b{i}" for i in range(SPAN_B)),
        " ".join(f"c{i}" for i in range(SPAN_B)),  # unique blocks only
        "too short",  # < SPAN_B words: contributes nothing
    ]
    rows = span_dedup(spark, _write_docs(tmp_path, texts)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_docs, r.n_occurrences, r.keeper_doc_id) == (2, 2, 0)


def test_tfidf_rare_term_outranks_ubiquitous(spark, tmp_path):
    """A term unique to one doc must outrank a term every doc shares,
    and ranks are dense 1..K with deterministic term tie-breaks."""
    from cs686_big_data_p1_spark.operators.corpus import (
        TFIDF_K,
        tfidf_topterms,
    )

    texts = [
        "common common common rare",
        "common filler0",
        "common filler1",
    ]
    rows = tfidf_topterms(spark, _write_docs(tmp_path, texts)).collect()
    doc0 = sorted(
        (r for r in rows if r.doc_id == 0), key=lambda r: r.rnk
    )
    # doc0: rare has tf=1, df=1 -> score 3; common tf=3, df=3 -> score 3
    # tie broken by term asc -> 'common' first; both present.
    assert [r.term for r in doc0][:2] == ["common", "rare"]
    for doc_id in (0, 1, 2):
        ranks = sorted(r.rnk for r in rows if r.doc_id == doc_id)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= TFIDF_K


def test_lexical_diversity_closed_forms(spark, tmp_path):
    from cs686_big_data_p1_spark.operators.corpus import lexical_diversity

    texts = [
        "x x x x",  # L=4, 1 type: ttr=0.25, simpson=0
        "a b c d",  # L=4, 4 types: ttr=1, simpson=1-4/16=0.75
    ]
    got = {
        r.doc_id: (r.n_words, r.n_distinct, r.ttr, r.simpson)
        for r in lexical_diversity(spark, _write_docs(tmp_path, texts)).collect()
    }
    assert got[0] == (4, 1, 0.25, 0.0)
    assert got[1] == (4, 4, 1.0, 0.75)


def test_domain_mix_weights(spark, tmp_path):
    """Shares sum to 1; an underrepresented source's weight hits the
    cap; an exactly-average source gets weight 1."""
    from cs686_big_data_p1_spark.operators.corpus import MIX_CAP, domain_mix
    import pandas as pd

    # src0: 98 tokens, src1: 1 token, src2: 1 token (via explicit rows)
    rows = [(0, " ".join(["t"] * 98), "en", "big", 0),
            (1, "t", "en", "tiny1", 0),
            (2, "t", "en", "tiny2", 0)]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    out = {r.source: r for r in domain_mix(spark, str(tmp_path)).collect()}
    assert abs(sum(r.token_share for r in out.values()) - 1.0) < 1e-12
    # tiny sources: target 1/3 vs share 0.01 -> uncapped 33.3 -> capped
    assert out["tiny1"].mix_weight == MIX_CAP
    assert out["tiny2"].mix_weight == MIX_CAP
    # big source: downweighted below 1
    assert out["big"].mix_weight == pytest.approx((1 / 3) / 0.98)


def test_text_normalize_messy_input(spark, tmp_path):
    """The fixture corpus is already canonical; this pins the actual
    normalization on mixed case, punctuation, and space runs."""
    from cs686_big_data_p1_spark.operators.corpus import text_normalize

    texts = [
        "Hello,  World!  42",
        "hello world 42",
        "already clean",
    ]
    got = {r.doc_id: r for r in text_normalize(spark, _write_docs(tmp_path, texts)).collect()}
    assert got[0].changed and not got[1].changed and not got[2].changed
    # normalization makes 0 and 1 identical
    assert got[0].norm_hash == got[1].norm_hash
    assert got[0].n_chars_norm == len("hello world 42")


def test_corpus_ops_plan_shape(spark, registry):
    """doc_chunk and text_normalize must stay shuffle-free (map-side
    only): no Exchange anywhere in their physical plans."""
    from cs686_big_data_p1_spark.plans import formatted_plan

    for name in ("doc_chunk", "text_normalize"):
        plan = formatted_plan(registry.QUERIES[name](spark, SF_MED))
        assert "Exchange" not in plan, name


def test_span_dedup_catches_misaligned_block(spark, tmp_path):
    """The stride-B/2 phase must catch a license block sitting at word
    offset 0 in one doc and offset B/2 in another (phase-0 hash of the
    first == phase-1 hash of the second); an offset not congruent to
    0 mod B/2 stays the documented approximation and is NOT found."""
    from cs686_big_data_p1_spark.operators.corpus import (
        SPAN_B,
        SPAN_HALF,
        span_dedup,
    )

    lic = " ".join(f"L{i}" for i in range(SPAN_B))
    texts = [
        lic + " " + " ".join(f"a{i}" for i in range(SPAN_B)),  # offset 0
        " ".join(f"b{i}" for i in range(SPAN_HALF))  # offset B/2
        + " " + lic + " "
        + " ".join(f"c{i}" for i in range(SPAN_HALF)),
        " ".join(f"d{i}" for i in range(5))  # offset 5: stays missed
        + " " + lic + " "
        + " ".join(f"e{i}" for i in range(SPAN_B - 5)),
    ]
    rows = span_dedup(spark, _write_docs(tmp_path, texts)).collect()
    lic_hash = hashlib.md5(lic.encode()).hexdigest()
    by_hash = {r.block_hash: r for r in rows}
    assert lic_hash in by_hash
    r = by_hash[lic_hash]
    assert (r.n_docs, r.keeper_doc_id) == (2, 0)  # docs 0+1, not doc 2
    assert r.n_occurrences == 2


def test_substring_dedup_finds_any_offset_span_dedup_misses(spark, tmp_path):
    """VERDICT r9 #6 adversarial case: a 20-token span planted at word
    offset 10 in one doc and offset 13 in another (relative offset 3 —
    congruent to neither 0 nor B/2 mod B) is PROVABLY invisible to
    span_dedup's two tile phases, but substring_dedup must report the
    exact maximal span (start, length) in BOTH documents: every
    stride-1 16-token window inside the span repeats, nothing outside
    does (all other tokens are globally unique)."""
    from cs686_big_data_p1_spark.operators.corpus import (
        SUB_L,
        span_dedup,
        substring_dedup,
    )

    span = [f"s{j}" for j in range(SUB_L + 4)]  # 20 tokens
    texts = [
        " ".join([f"u{i}" for i in range(10)] + span
                 + [f"v{i}" for i in range(15)]),
        " ".join([f"w{i}" for i in range(13)] + span
                 + [f"x{i}" for i in range(12)]),
        " ".join(f"y{i}" for i in range(40)),  # pure filler
    ]
    sf = _write_docs(tmp_path, texts)
    assert span_dedup(spark, sf).count() == 0  # the documented blind spot
    rows = {
        r.doc_id: r for r in substring_dedup(spark, sf).collect()
    }
    assert set(rows) == {0, 1}
    assert (rows[0].span_start, rows[0].span_len) == (11, len(span))
    assert (rows[1].span_start, rows[1].span_len) == (14, len(span))
    assert rows[0].n_windows == rows[1].n_windows == len(span) - SUB_L + 1


def test_substring_dedup_merges_runs_and_catches_self_repeat(
    spark, tmp_path
):
    """Two spans separated by a unique gap must come back as two
    maximal runs, not one; and a span repeated at two offsets INSIDE
    one document (self-plagiarism) is also reported (Lee et al.
    count-any-two-occurrences semantics)."""
    from cs686_big_data_p1_spark.operators.corpus import (
        SUB_L,
        substring_dedup,
    )

    a = [f"a{j}" for j in range(SUB_L)]
    b = [f"b{j}" for j in range(SUB_L)]
    texts = [
        " ".join(a + [f"g{i}" for i in range(SUB_L)] + b),
        " ".join(a + [f"h{i}" for i in range(SUB_L)] + b),
        # self-repeat: same SUB_L-token run twice in ONE doc
        " ".join([f"c{j}" for j in range(SUB_L)]
                 + [f"k{i}" for i in range(SUB_L)]
                 + [f"c{j}" for j in range(SUB_L)]),
    ]
    sf = _write_docs(tmp_path, texts)
    got = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in substring_dedup(spark, sf).collect()
    )
    assert got == [
        (0, 1, SUB_L), (0, 2 * SUB_L + 1, SUB_L),
        (1, 1, SUB_L), (1, 2 * SUB_L + 1, SUB_L),
        (2, 1, SUB_L), (2, 2 * SUB_L + 1, SUB_L),
    ]


def test_substring_scrub_keeps_corpus_first_copy(spark, tmp_path):
    """Transform contract: the corpus-FIRST occurrence of a duplicated
    span survives verbatim; every later copy — in another document or
    at another offset of the same document — is stripped; untouched
    text passes through byte-identical and removal counts are exact."""
    from cs686_big_data_p1_spark.operators.corpus import (
        SUB_L,
        substring_scrub,
    )

    span = [f"s{j}" for j in range(SUB_L)]
    texts = [
        " ".join([f"u{i}" for i in range(3)] + span),     # keeper (doc 0)
        " ".join(span + [f"v{i}" for i in range(4)]),     # later copy
        # self-repeat: first copy kept, second stripped
        " ".join([f"c{j}" for j in range(SUB_L)]
                 + [f"g{i}" for i in range(3)]
                 + [f"c{j}" for j in range(SUB_L)]),
        "tiny doc",                                        # < SUB_L: as-is
    ]
    sf = _write_docs(tmp_path, texts)
    got = {r.doc_id: r for r in substring_scrub(spark, sf).collect()}
    assert got[0].clean_text == texts[0] and got[0].n_removed == 0
    assert got[1].clean_text == " ".join(f"v{i}" for i in range(4))
    assert got[1].n_removed == SUB_L
    assert got[2].clean_text == " ".join(
        [f"c{j}" for j in range(SUB_L)] + [f"g{i}" for i in range(3)]
    )
    assert got[2].n_removed == SUB_L
    assert got[3].clean_text == "tiny doc" and got[3].n_removed == 0


def test_mg_retention_bound():
    """Misra-Gries summary (k=10) must retain every term whose count
    exceeds N/(k+1), under heavy churn from 500 singleton terms."""
    from cs686_big_data_p1_spark.operators.corpus import mg_update

    # 500 distinct noise tokens (count 1 each) + one hot token x120:
    # N = 620, N/(k+1) = 56.4 — 'hot' must survive k=10 counters.
    texts = []
    hot_left = 120
    for i in range(500):
        texts.append(f"noise{i}")
        if hot_left and i % 4 == 0:
            texts.append("hot")
            hot_left -= 1
    texts += ["hot"] * hot_left
    counters: dict = {}
    mg_update(counters, texts, 10)
    assert len(counters) <= 10
    assert "hot" in counters
    # estimate never exceeds the true count
    assert counters["hot"] <= 120


def test_heavy_hitters_exact_vs_bruteforce(spark, tmp_path):
    """Two-pass MG + recount must equal the brute-force GROUP BY
    answer on a corpus whose vocabulary far exceeds what one doc's
    batch fits, including boundary terms at exactly N/200."""
    from collections import Counter

    from cs686_big_data_p1_spark.operators.corpus import (
        HH_PHI_INV,
        heavy_hitters,
    )

    texts = []
    # 3000 distinct rare terms + two frequent terms
    for i in range(300):
        texts.append(" ".join(f"w{i}_{j}" for j in range(10)))
    texts.append(" ".join(["alpha"] * 40))
    texts.append(" ".join(["beta"] * 17))
    toks = [t for s in texts for t in s.split(" ")]
    n = len(toks)
    truth = {
        t: c for t, c in Counter(toks).items() if c * HH_PHI_INV >= n
    }
    got = {
        r.term: r.freq
        for r in heavy_hitters(spark, _write_docs(tmp_path, texts)).collect()
    }
    assert got == truth
    assert "alpha" in got  # sanity: the planted hitters actually qualify


def test_max_concurrency_matches_bruteforce_sweep(spark):
    """Sharded two-phase prefix sum must equal a driver-side sweep
    line over the same session intervals at sf0.001."""
    from cs686_big_data_p1_spark.operators.sessions import (
        event_sessionize,
        max_concurrency,
    )

    import datetime

    sess = event_sessionize(spark, SF_SMALL).collect()
    deltas = []
    for r in sess:
        deltas.append((r.session_start, 1))
        deltas.append((r.session_end, -1))
    deltas.sort(key=lambda d: (d[0], -d[1]))
    day_of = lambda ts: ts.replace(  # noqa: E731
        hour=0, minute=0, second=0, microsecond=0
    )
    conc = 0
    day_max: dict = {}
    for ts, d in deltas:
        conc += d
        day = day_of(ts)
        day_max[day] = max(day_max.get(day, conc), conc)
    # densified semantics: every calendar day appears; its peak is the
    # max concurrency at any instant, including midnight carry-in
    days = sorted({day_of(ts) for ts, _ in deltas})
    peak: dict = {}
    d = days[0]
    while d <= days[-1]:
        carry_in = sum(dd for ts, dd in deltas if day_of(ts) < d)
        peak[d] = max(carry_in, day_max.get(d, carry_in))
        d += datetime.timedelta(days=1)
    got = {
        r.day: r.peak_concurrency
        for r in max_concurrency(spark, SF_SMALL).collect()
    }
    assert got == peak


def test_remove_boilerplate_strips_shared_block(spark, tmp_path):
    """A 16-word license block present in two docs is removed from
    BOTH; unique blocks and sub-block tails survive verbatim; a doc
    shorter than one block passes through untouched."""
    from cs686_big_data_p1_spark.operators.corpus import (
        SPAN_B,
        remove_boilerplate,
    )

    lic = " ".join(f"L{i}" for i in range(SPAN_B))
    uniq0 = " ".join(f"a{i}" for i in range(SPAN_B))
    tail = "t0 t1 t2"
    texts = [
        lic + " " + uniq0 + " " + tail,   # block 0 = lic (dup), block 1 uniq
        lic + " " + " ".join(f"b{i}" for i in range(SPAN_B)),
        "short doc only",
    ]
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_boilerplate(
            spark, _write_docs(tmp_path, texts)
        ).collect()
    }
    assert got[0] == (uniq0 + " " + tail, 1)
    assert got[1][1] == 1 and not got[1][0].startswith("L0")
    assert got[2] == ("short doc only", 0)


def test_mg_retention_bound_property():
    """Hypothesis: for ANY token stream and any k, the MG summary
    retains every term with true count > N/(k+1), and no estimate
    exceeds its true count (the two halves of the heavy_hitters
    exactness proof)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cs686_big_data_p1_spark.operators.corpus import mg_update

    @settings(max_examples=200, deadline=None)
    @given(
        tokens=st.lists(
            st.integers(min_value=0, max_value=30), min_size=1, max_size=400
        ),
        k=st.integers(min_value=1, max_value=12),
        n_batches=st.integers(min_value=1, max_value=4),
    )
    def check(tokens, k, n_batches):
        texts = []
        step = max(1, len(tokens) // n_batches)
        for i in range(0, len(tokens), step):
            texts.append(" ".join(f"t{t}" for t in tokens[i : i + step]))
        counters: dict = {}
        for t in texts:
            mg_update(counters, [t], k)
        true = Counter(f"t{t}" for t in tokens)
        n = len(tokens)
        assert len(counters) <= k
        for term, c in true.items():
            if c * (k + 1) > n:
                assert term in counters, (term, c, n, k)
        for term, est in counters.items():
            assert 0 < est <= true[term], (term, est, true[term])

    check()


def test_dsir_weights_prefer_target_like_docs(spark, tmp_path):
    """Planted DSIR check: the target corpus (lexicographically-first
    source) speaks {alpha, beta}; an off-target doc written in the
    SAME vocabulary must weigh strictly higher than an off-target doc
    written in a disjoint vocabulary ({omega, psi}), and a pure-target
    doc's weight is the maximum possible (every bucket ratio ~1e6,
    minus only the off-target dilution of the raw marginals). Words
    chosen to land in four distinct hash buckets (precomputed:
    alpha=59, beta=43, omega=52, psi=28 mod 64)."""
    from cs686_big_data_p1_spark.operators.corpus import dsir_weights

    rows = [
        # target source 'aaa': alpha/beta vocabulary
        (0, "alpha beta alpha beta", "en", "aaa", 21),
        (1, "beta alpha beta alpha", "en", "aaa", 21),
        # off-target source 'zzz': one target-like doc, one disjoint
        (2, "alpha beta alpha beta", "en", "zzz", 21),
        (3, "omega psi omega psi", "en", "zzz", 19),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)

    out = {
        r.doc_id: r for r in dsir_weights(spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    # disjoint-vocab doc: no bucket overlaps the target -> zero weight
    assert out[3].score_e6 == 0 and out[3].weight_e6 == 0
    # target-like off-target doc scores exactly like the target docs
    # (same bucket profile): ratio per bucket = 1e6 * t_b / r_b with
    # t_b = 4 (two target docs x 2 occurrences), r_b = 6 (plus doc 2)
    assert out[2].weight_e6 == out[0].weight_e6 == out[1].weight_e6
    expected_ratio = (1_000_000 * 4) // 6
    assert out[0].weight_e6 == expected_ratio
    assert out[0].n_tokens == 4 and out[3].n_tokens == 4
    assert out[2].weight_e6 > out[3].weight_e6


def test_dsir_sample_excludes_zero_weight_docs(spark, tmp_path):
    """dsir_sample = dsir_weights composed with the exact systematic
    sampler: on the planted two-vocabulary corpus the disjoint-vocab
    doc has weight 0 — zero length on the sample line — so it can
    never be picked; the three equal-weight target-like docs split the
    WS_K grid points near-evenly (systematic sampling's zero-variance
    guarantee: |picks - K/3| <= 1)."""
    from cs686_big_data_p1_spark.operators.corpus import dsir_sample
    from cs686_big_data_p1_spark.operators.pipeline import WS_K

    rows = [
        (0, "alpha beta alpha beta", "en", "aaa", 21),
        (1, "beta alpha beta alpha", "en", "aaa", 21),
        (2, "alpha beta alpha beta", "en", "zzz", 21),
        (3, "omega psi omega psi", "en", "zzz", 19),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)

    out = {r.doc_id: r for r in dsir_sample(spark, str(tmp_path)).collect()}
    assert 3 not in out
    assert set(out) == {0, 1, 2}
    total = sum(r.n_picks for r in out.values())
    assert total == WS_K
    for r in out.values():
        assert abs(r.n_picks - WS_K / 3) <= 1
