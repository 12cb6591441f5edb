"""Text-analysis operator checks that want a real testdata table rather
than a synthesized corpus."""

SF_DIR = "/root/testdata/sf0.01"


def test_token_counts_bpe_partitions_and_matches_python(spark):
    """The three token classes must partition the combined tokenization,
    and counts must equal a plain python re tokenization of the same text
    (same ASCII class structure)."""
    import re

    from abwcf_spark.queries import _TOK_ALL, token_counts_bpe

    out = token_counts_bpe(spark, SF_DIR).toPandas().set_index("doc_id")
    assert (out["n_tokens"] == out["n_alpha"] + out["n_num"] + out["n_other"]).all()
    assert (out["n_tokens"] > 0).any()

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    pat = re.compile(_TOK_ALL)
    for doc_id, text in zip(docs.doc_id[:50], docs.text[:50]):
        assert out.loc[int(doc_id), "n_tokens"] == len(pat.findall(text))


def test_dup_spans_constructed_boilerplate(spark):
    """Span-level dedup on constructed docs: two documents share a long
    boilerplate paragraph (below doc-level Jaccard threshold vs their
    distinct bodies), a third is built from a disjoint alphabet.  The
    extracted spans must equal the independent python mirror's, cover the
    shared paragraph in both carriers, and never mention the clean doc."""
    from abwcf_spark.oracle_fixtures import mirror_dup_spans
    from abwcf_spark.queries import dup_spans

    boiler = (
        "This document is provided under the Example Public License v1. "
        "Redistribution and use in source and binary forms are permitted."
    )
    body1 = "alpha bravo charlie delta echo foxtrot golf hotel india " * 6
    body2 = "kilo lima mike november oscar papa quebec romeo sierra " * 6
    clean = "0123456789" * 40  # digits only: no 8-gram overlaps the others
    docs = [(1, boiler + " " + body1), (2, boiler + " " + body2), (3, clean)]

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in dup_spans(sdf).collect()
    )
    want = sorted(mirror_dup_spans(docs))
    assert got == want
    assert got, "shared boilerplate must produce spans"
    by_doc = {d for d, _, _ in got}
    assert 1 in by_doc and 2 in by_doc and 3 not in by_doc
    # the span starting at the paragraph head covers (at least) the
    # paragraph body minus the window tail
    for doc in (1, 2):
        s0 = [(s, n) for d, s, n in got if d == doc and s == 0]
        assert s0 and s0[0][1] >= len(boiler) - 11


def test_dup_spans_no_cross_doc_sharing_is_empty(spark):
    """Docs with pairwise-disjoint alphabets share no fingerprints →
    no spans at all (within-doc repetition alone must NOT create spans)."""
    from abwcf_spark.queries import dup_spans

    docs = [(1, "abcdefgh" * 30), (2, "ijklmnop" * 30), (3, "qrstuvwx" * 30)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    assert dup_spans(sdf).count() == 0


def test_dup_span_strip_removes_boilerplate(spark):
    """Stripping must cut exactly the extracted spans: clean docs pass
    through verbatim, carriers lose the shared paragraph, and
    text == interleave(clean_text, spans) reconstructs for every doc."""
    from abwcf_spark.queries import dup_span_strip, dup_spans

    boiler = (
        "This document is provided under the Example Public License v1. "
        "Redistribution and use in source and binary forms are permitted."
    )
    body1 = "alpha bravo charlie delta echo foxtrot golf hotel india " * 6
    body2 = "kilo lima mike november oscar papa quebec romeo sierra " * 6
    clean = "0123456789" * 40
    docs = [(1, boiler + " " + body1), (2, boiler + " " + body2), (3, clean)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")

    out = {r.doc_id: r for r in dup_span_strip(sdf).collect()}
    spans = {}
    for r in dup_spans(sdf).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_len))

    assert out[3].clean_text == clean and out[3].n_spans == 0
    for d, text in docs:
        rec = out[d]
        sp = sorted(spans.get(d, []))
        acc, pos = [], 0
        for s, n in sp:
            acc.append(text[pos:s]); pos = s + n
        acc.append(text[pos:])
        assert rec.clean_text == "".join(acc)
        assert rec.removed_chars == sum(n for _, n in sp)
    assert boiler not in out[1].clean_text and boiler not in out[2].clean_text


def test_training_pipeline_composition_constructed(spark):
    """The composite pipeline entry (boilerplate strip → token count on the
    CLEANED text → quality gate → stratified sample) on a CONSTRUCTED
    corpus, checked row-for-row against an independent python chain built
    from mirror_dup_spans + plain slicing/hashing.  Plants every branch:
    boilerplated docs with long tails (survive), boilerplated docs with
    short tails (token-gated out), clean pass-through docs, and a second
    language stratum with its own sample threshold."""
    import hashlib
    import tempfile

    import pandas as pd

    from abwcf_spark.oracle_fixtures import SPAN_BOILER_DF, mirror_dup_spans
    from abwcf_spark.queries import training_pipeline_sample

    boiler = ("LICENSE NOTICE this content is distributed under the "
              "standard terms and conditions apply to every mirror copy. ")
    docs = []
    for i in range(SPAN_BOILER_DF + 10):  # above the DF gate
        long_tail = i % 2 == 0
        tail = (f"unique finding {i} " * (12 if long_tail else 2)
                + f"closing remark number {i}.")
        lang = "de" if i % 10 == 6 else "en"
        docs.append({"doc_id": 1000 + i, "text": boiler + tail,
                     "lang": lang, "source": f"s{i % 3}",
                     "n_chars": len(boiler + tail)})
    for i in range(8):  # clean docs — no cross-doc spans at all
        t = (f"entirely original essay {i} with plenty of words " * 4
             + f"ending {i}.")
        docs.append({"doc_id": 2000 + i, "text": t, "lang": "en",
                     "source": "clean", "n_chars": len(t)})
    pdf = pd.DataFrame(docs)

    # independent chain: mirror spans -> slice -> count -> gate -> sample
    texts = {int(r.doc_id): str(r.text) for r in pdf.itertuples()}
    spans = {}
    for doc_id, s, n in mirror_dup_spans(texts.items(),
                                         min_df=SPAN_BOILER_DF):
        spans.setdefault(doc_id, []).append((s, n))
    expect = {}
    for r in pdf.itertuples():
        text, doc_id = str(r.text), int(r.doc_id)
        keep, pos = [], 0
        for s, n in sorted(spans.get(doc_id, [])):
            keep.append(text[pos:s])
            pos = s + n
        keep.append(text[pos:])
        clean = "".join(keep)
        n_tokens = clean.count(" ") + 1
        if n_tokens < 16:
            continue
        bucket = hashlib.md5(f"{doc_id}:pipe".encode()).hexdigest()[:2]
        if bucket >= ("60" if r.lang == "en" else "a0"):
            continue
        expect[doc_id] = (r.lang, r.source, n_tokens, len(spans.get(doc_id, [])),
                          sum(n for _, n in spans.get(doc_id, [])))

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
        out = training_pipeline_sample(spark, d).toPandas()

    got = {int(r.doc_id): (r.lang, r.source, int(r.n_tokens),
                           int(r.n_spans), int(r.removed_chars))
           for r in out.itertuples()}
    assert got == expect
    assert any(v[3] > 0 for v in expect.values()), "no stripped doc sampled"
    assert any(v[3] == 0 for v in expect.values()), "no clean doc sampled"
    assert {v[0] for v in expect.values()} == {"en", "de"}, "one stratum only"


def test_doc_repetition_signals_constructed(spark):
    """Gopher-family repetition signals on hand-computable docs:
    a looped doc (one sentence repeated), a clean doc (all-distinct
    words), an empty doc, and a keyword-stuffed doc."""
    from abwcf_spark.queries import doc_repetition_signals

    docs = [
        # "spam ham eggs" ×4 → 12 words / 3 distinct; bigrams: 11 total,
        # "spam ham"×4 top; trigrams: 10, every one repeated
        (1, "spam ham eggs " * 4),
        # all distinct words → every signal 0
        (2, "alpha bravo charlie delta echo"),
        (3, ""),
        # "buy" stuffed: 6 words / 2 distinct; top bigram "buy buy"×3 of 5;
        # trigrams b b b, b b n, b n b, n b b → all 4 distinct
        (4, "buy buy buy now buy buy"),
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r.doc_id: r.asDict()
            for r in doc_repetition_signals(spark, d).collect()
        }

    assert out[1] == {
        "doc_id": 1,
        "n_words": 12,
        "dup_word_frac_milli": 1000 * 9 // 12,
        "top_bigram_frac_milli": 1000 * 4 // 11,
        "dup_trigram_frac_milli": 1000,
    }
    assert out[2] == {
        "doc_id": 2,
        "n_words": 5,
        "dup_word_frac_milli": 0,
        "top_bigram_frac_milli": 1000 // 4,  # every bigram distinct: 1/4
        "dup_trigram_frac_milli": 0,
    }
    assert out[3] == {
        "doc_id": 3,
        "n_words": 0,
        "dup_word_frac_milli": 0,
        "top_bigram_frac_milli": 0,
        "dup_trigram_frac_milli": 0,
    }
    assert out[4] == {
        "doc_id": 4,
        "n_words": 6,
        "dup_word_frac_milli": 1000 * 4 // 6,
        "top_bigram_frac_milli": 1000 * 3 // 5,
        "dup_trigram_frac_milli": 0,
    }


def test_decontaminate_constructed(spark):
    """Eval-overlap flagging on constructed docs: doc 0 is the eval suite
    (eval_mod=97 → doc_id 0).  Doc 1 embeds one eval 4-gram twice (two
    occurrence hits), doc 2 shares only a 3-gram (below n), doc 3 is
    disjoint."""
    from abwcf_spark.queries import decontaminate

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        # "quick brown fox jumps" appears twice → n_contaminated 2
        (1, "a quick brown fox jumps here and a quick brown fox jumps there"),
        # only "quick brown fox" (3-gram) shared; "quick brown fox sits"
        # is not an eval 4-gram
        (2, "quick brown fox sits still"),
        (3, "zebra yak xerus wombat vole urchin"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: (r.n_contaminated, r.contaminated)
           for r in decontaminate(sdf, n=4, eval_mod=97).collect()}
    assert 0 not in out, "eval docs are excluded from the output"
    assert out[1] == (2, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval-gram probe must reach the corpus scan as a broadcast join
    — a shuffled join on raw gram strings would move the whole corpus's
    n-grams at 100 TB."""
    from abwcf_spark.queries import ngram_decontaminate

    plan = ngram_decontaminate(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
