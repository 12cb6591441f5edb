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
