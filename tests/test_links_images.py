"""Tests for link extraction (HtmlParser.scala semantics) and the image
payload kernel (PNG round-trip, lossy PSNR ≥ 40 dB invariant, phash)."""

import numpy as np
import pytest

from abwcf_spark.kernels.imagecodec import (
    LOSSY_PSNR_THRESHOLD_DB,
    decode_image,
    decode_png,
    encode_image,
    encode_lossy,
    encode_png,
    gen_pixels,
    phash64,
    psnr,
)
from abwcf_spark.kernels.links import (
    extract_links,
    meta_robots_nofollow,
    resolve_redirect,
)

HTML = b"""
<html><head></head><body>
<a href="https://a.example/1">one</a>
<a href='/rel/2'>two</a>
<a href=nohq3>three</a>
<a href="https://a.example/1">dup</a>
<a href="mailto:x@example.com">mail</a>
<a href="HTTPS://UPPER.example/4">four</a>
</body></html>
"""


def test_extract_links_order_distinct_http_only():
    # first-occurrence distinct, doc order, http*-prefix only, absolutized
    got = extract_links(HTML, "https://base.example/dir/page")
    assert got == [
        "https://a.example/1",
        "https://base.example/rel/2",
        "https://base.example/dir/nohq3",
        # urljoin lowercases the scheme here (jsoup keeps it); immaterial —
        # the downstream normalizer lowercases scheme+host regardless.
        "https://UPPER.example/4",
    ]


def test_meta_nofollow_skips_doc():
    doc = b'<meta name="robots" content="noindex, NOFOLLOW"><a href="https://x/1">x</a>'
    assert meta_robots_nofollow(doc)
    assert extract_links(doc, "https://b/") == []
    ok = b'<meta name="robots" content="noindex"><a href="https://x/1">x</a>'
    assert extract_links(ok, "https://b/") == ["https://x/1"]


def test_resolve_redirect():
    # HttpUtils.scala:16-27 — relative resolved, original fragment forced
    assert resolve_redirect("https://abs.example/x", "https://o/p") == "https://abs.example/x"
    assert resolve_redirect("/new", "https://o.example/old?q#frag") == "https://o.example/new#frag"
    assert resolve_redirect("next", "https://o.example/a/old") == "https://o.example/a/next"
    assert resolve_redirect(None, "https://o/p") is None


def test_png_roundtrip_exact():
    px = gen_pixels("img-1", 37, 23)
    data = encode_png(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = decode_png(data)
    assert np.array_equal(px, back)
    assert psnr(px, back) == float("inf")


def test_lossy_psnr_above_threshold():
    for iid in ["a", "b", "c"]:
        px = gen_pixels(iid, 64, 48)
        back = decode_image(encode_lossy(px, "jpeg"))
        p = psnr(px, back)
        assert p >= LOSSY_PSNR_THRESHOLD_DB, p


def test_encode_decode_dispatch():
    px = gen_pixels("d", 16, 16)
    assert np.array_equal(decode_image(encode_image(px, "png")), px)
    assert psnr(decode_image(encode_image(px, "webp")), px) >= 40


def test_gen_pixels_deterministic():
    a = gen_pixels("same-id", 32, 32)
    b = gen_pixels("same-id", 32, 32)
    c = gen_pixels("other-id", 32, 32)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_phash_properties():
    px = gen_pixels("p", 64, 64)
    h1 = phash64(px)
    assert isinstance(h1, int) and -(2**63) <= h1 < 2**63
    # lossy round-trip keeps the perceptual hash (tiny quantization error)
    h2 = phash64(decode_image(encode_lossy(px, "jpeg")))
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 4


def test_decode_unknown_raises():
    with pytest.raises(ValueError):
        decode_image(b"garbage-bytes")


def test_fixture_mirror_decoder_matches_kernel():
    """The constructed-oracle image fixtures are built by an INDEPENDENT
    decoder (oracle_fixtures.mirror_decode); it must agree with the engine
    kernel on pixels, corruption classification, and a-hash bits for every
    format — otherwise the driver gate would compare apples to oranges."""
    import numpy as np

    from abwcf_spark.kernels.imagecodec import (
        decode_image,
        encode_image,
        gen_pixels,
        phash64,
    )
    from abwcf_spark.oracle_fixtures import _mirror_phash, mirror_decode

    for fmt in ("png", "jpeg", "webp"):
        px = gen_pixels(f"mirror-{fmt}", 31, 22)
        data = encode_image(px, fmt)
        k = decode_image(data)
        m = mirror_decode(data)
        assert (k == m).all(), fmt
        assert phash64(k) == _mirror_phash(m), fmt
        # corruption classified identically (truncated tail)
        cut = data[: len(data) - 9]
        k_err = m_err = False
        try:
            decode_image(cut)
        except ValueError:
            k_err = True
        try:
            mirror_decode(cut)
        except ValueError:
            m_err = True
        assert k_err == m_err, fmt


def test_image_resize_thumbnail_is_exact_integer(spark):
    """The NN-resize kernel's thumbnail mean must equal a straightforward
    numpy NN resize computed here (floor-index sampling, integer mean) —
    and the rows must cover every decodable image exactly once."""
    import numpy as np

    from abwcf_spark.kernels.imagecodec import decode_image
    from abwcf_spark.operators.udfs import RESIZE_TARGET
    from abwcf_spark.queries import image_resize_stats
    from abwcf_spark.testing.corpus import T2_MULTI, gen_corpus

    out = image_resize_stats(spark, None).toPandas()
    pdf = gen_corpus(T2_MULTI)["corpus"]
    pdf = pdf[pdf["bytes"].notna()].reset_index(drop=True)
    assert len(out) == len(pdf)
    rh, rw = RESIZE_TARGET
    want = {}
    for url, data in zip(pdf["url"], pdf["bytes"]):
        px = decode_image(bytes(data))
        h, w = px.shape[0], px.shape[1]
        iy = (np.arange(rh) * h) // rh
        ix = (np.arange(rw) * w) // rw
        thumb = px[iy][:, ix]
        want[url] = (int(thumb.astype(np.int64).sum()) * 1000) // int(thumb.size)
    got = dict(zip(out["url"], out["mean_luma_milli"]))
    assert got == want


def test_image_exact_dedup_collapses_planted_duplicates(spark):
    """Every planted byte-identical duplicate must land in its original's
    md5 group (n_copies=2, canonical = the lexicographically smaller url);
    everything else stays a singleton."""
    from abwcf_spark.oracle_fixtures import image_dedup_corpus
    from abwcf_spark.queries import image_exact_dedup

    out = image_exact_dedup(spark, None).toPandas()
    corpus = image_dedup_corpus()
    n_dups = corpus["url"].str.endswith("?mirror=1").sum()
    assert n_dups > 0, "fixture must plant duplicates"
    assert len(out) == len(corpus) - n_dups  # one group per distinct payload
    assert (out["n_copies"] == 2).sum() == n_dups
    assert not out["canonical_url"].str.endswith("?mirror=1").any()
