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
