"""Vectorized pandas/Arrow UDF factories wrapping the pure-pandas kernels.

Per the north rule, every per-row computation that cannot be expressed as a
Catalyst built-in runs as an Arrow-batched pandas UDF — never row-at-a-time
Python.  Each factory binds config/broadcast state into a closure and
returns a ready-to-use column function.

Kernel provenance (reference semantics, re-expressed from public API docs):
- normalize:  ``/root/reference/src/main/scala/abwcf/services/UrlNormalizationService.scala:21-79``
- robots:     ``actors/HostManager.scala:110-167``, ``SlickHostRepository.scala:43-57``, RFC 9309
- redirect:   ``util/HttpUtils.scala:16-27``
- payload:    ``BASELINE.json.input_hint`` (decoded-pixel PSNR ≥ 40 dB lossy,
              exact for png, caption equality, phash Hamming gate)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import CrawlConfig
from ..kernels.robots import host_outcome, robots_allowed_series
from ..kernels.urlnorm import normalize_series


def make_normalize_udf(cfg: CrawlConfig):
    ru, rq, rf = cfg.remove_userinfo, cfg.remove_query, cfg.remove_fragment

    @F.pandas_udf(StringType())
    def normalize_udf(urls: pd.Series) -> pd.Series:
        return normalize_series(urls, ru, rq, rf)

    return normalize_udf


@F.pandas_udf(BooleanType())
def robots_allowed_udf(
    urls: pd.Series, rule_modes: pd.Series, rules: pd.Series
) -> pd.Series:
    """Nullable boolean: NA where the host is unknown (rule_mode null) —
    callers apply fail-open (lenient) / fail-close (strict) via coalesce."""
    return robots_allowed_series(urls, rule_modes, rules)


_HOST_OUTCOME_SCHEMA = StructType(
    [
        StructField("rule_mode", StringType()),
        StructField("robot_rules", StringType()),
        StructField("crawl_delay", LongType()),
        StructField("lifetime_s", LongType()),
    ]
)


def make_host_outcome_udf(cfg: CrawlConfig):
    uas = cfg.user_agents

    @F.pandas_udf(_HOST_OUTCOME_SCHEMA)
    def host_outcome_udf(outcomes: pd.Series, bodies: pd.Series) -> pd.DataFrame:
        # parse once per unique (outcome, body) — robots bodies repeat heavily
        out = pd.DataFrame(
            index=outcomes.index,
            columns=["rule_mode", "robot_rules", "crawl_delay", "lifetime_s"],
        )
        key = pd.DataFrame({"o": outcomes.astype(object), "b": bodies.astype(object)})
        for (o, b), idx in key.groupby(["o", "b"], dropna=False).groups.items():
            mode, rules, delay, life = host_outcome(
                str(o), None if pd.isna(b) else str(b), uas
            )
            out.loc[idx, ["rule_mode", "robot_rules", "crawl_delay", "lifetime_s"]] = [
                mode,
                rules,
                delay,
                life,
            ]
        out["crawl_delay"] = out["crawl_delay"].astype("int64")
        out["lifetime_s"] = out["lifetime_s"].astype("int64")
        return out

    return host_outcome_udf


@F.pandas_udf(ArrayType(StringType()))
def extract_links_udf(bodies: pd.Series, urls: pd.Series) -> pd.Series:
    """HTML link extraction (HtmlParser.scala:28-52) over raw body bytes:
    absolutized, first-occurrence-distinct, http*-only; meta-robots
    nofollow (:65-72) empties the doc.  Arrow-batched; regex engine is C."""
    from ..kernels.links import extract_links_series

    return extract_links_series(bodies, urls)


@F.pandas_udf(StringType())
def resolve_redirect_udf(locations: pd.Series, urls: pd.Series) -> pd.Series:
    from ..kernels.links import resolve_redirect

    return pd.Series(
        [resolve_redirect(loc if isinstance(loc, str) else None, u)
         for loc, u in zip(locations, urls)],
        index=locations.index,
        dtype=object,
    )


def make_bloom_probe_udf(spark, bloom):
    """Broadcast the bloom bit array once; probe batches of xxhash64 keys.

    False = definitely never inserted (skips the exact anti-join);
    True  = maybe seen (falls through to the anti-join authority).
    """
    bc = spark.sparkContext.broadcast(bloom.to_bytes())

    @F.pandas_udf(BooleanType())
    def bloom_probe_udf(hashes: pd.Series) -> pd.Series:
        from ..kernels.bloom import BloomFilter

        bf = BloomFilter.from_bytes(bc.value)
        return pd.Series(
            bf.might_contain(hashes.to_numpy(dtype=np.int64)), index=hashes.index
        )

    return bloom_probe_udf, bc


def make_cuckoo_probe_udf(spark, cuckoo):
    """Cuckoo twin of make_bloom_probe_udf: broadcast the fingerprint table
    (+ exact overflow stash) once; probe batches of xxhash64 keys.  Same
    contract — False proves never-inserted — plus the table reflects any
    DELETIONS applied before the broadcast."""
    bc = spark.sparkContext.broadcast(cuckoo.to_bytes())

    @F.pandas_udf(BooleanType())
    def cuckoo_probe_udf(hashes: pd.Series) -> pd.Series:
        from ..kernels.cuckoo import CuckooFilter

        cf = CuckooFilter.from_bytes(bc.value)
        return pd.Series(
            cf.might_contain(hashes.to_numpy(dtype=np.int64)), index=hashes.index
        )

    return cuckoo_probe_udf, bc


# --------------------------------------------------------------------------
# Payload validation (mapInPandas batch function)
# --------------------------------------------------------------------------

PAYLOAD_CHECK_SCHEMA = "url string, payload_ok boolean"


def validate_payload_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: decode image bytes, check PSNR/exactness vs the
    deterministically regenerated reference pixels, phash Hamming distance,
    and caption equality (input_hint row invariant).

    Decode and reference synthesis stay per-image (independent RNG streams /
    variable payloads), but all pixel math — exact-equality, PSNR, phash —
    runs vectorized over same-shape image stacks via the bit-exact batched
    kernels (phash64_batch emulates numpy's pairwise reduction order, so
    every decision is identical to the per-image path; asserted in
    tests/test_payload_vectorized.py and verified exhaustively over the
    bench corpus)."""
    from ..kernels.hashing import xxhash64_str
    from ..kernels.imagecodec import (
        LOSSY_PSNR_THRESHOLD_DB,
        decode_image,
        gen_pixels,
        phash64_batch,
    )

    for pdf in batches:
        n = len(pdf)
        oks = np.zeros(n, dtype=bool)
        if n:
            urls = pdf["url"].to_numpy(dtype=object)
            img_ids = pdf["image_id"].to_numpy(dtype=object)
            ws = pdf["w"].to_numpy()
            hs = pdf["h"].to_numpy()
            fmts = pdf["fmt"].to_numpy(dtype=object)
            caps = pdf["caption"].to_numpy(dtype=object)
            phs = pdf["phash"].to_numpy()
            blobs = pdf["bytes"].to_numpy(dtype=object)
            groups: dict = {}  # (h, w, is_png) → ([row idx], [decoded px])
            for i in range(n):
                try:
                    px = decode_image(bytes(blobs[i]))
                except (ValueError, TypeError):
                    continue
                h, w = int(hs[i]), int(ws[i])
                if px.shape != (h, w, 3):
                    continue  # shape mismatch fails pix_ok on both branches
                g = groups.setdefault((h, w, fmts[i] == "png"), ([], []))
                g[0].append(i)
                g[1].append(px)
            for (h, w, is_png), (idxs, pxs) in groups.items():
                idx = np.asarray(idxs, dtype=np.int64)
                px_stack = np.stack(pxs)
                ref_stack = np.stack(
                    [gen_pixels(str(img_ids[i]), w, h) for i in idxs]
                )
                ph = phash64_batch(px_stack)
                row_ph = phs[idx].astype(np.int64)
                if is_png:
                    pix_ok = (
                        (px_stack == ref_stack).reshape(len(idx), -1).all(axis=1)
                    )
                    ham_ok = ph == row_ph
                else:
                    # int16 holds any uint8 difference exactly; the einsum
                    # accumulates in int64 (max sum ≈ 1.4e9), so mse is the
                    # exact integer np.mean((a-b)**2) would produce
                    d = px_stack.astype(np.int16)
                    d -= ref_stack
                    sq = np.einsum("nijk,nijk->n", d, d, dtype=np.int64)
                    mse = sq.astype(np.float64) / float(h * w * 3)
                    # scalar np.log10 per element — the same scalar call the
                    # per-image psnr() makes, so boundary rounding matches
                    pix_ok = np.fromiter(
                        (
                            m == 0.0
                            or float(10.0 * np.log10(255.0 * 255.0 / m))
                            >= LOSSY_PSNR_THRESHOLD_DB
                            for m in mse
                        ),
                        dtype=bool,
                        count=len(idx),
                    )
                    x = np.bitwise_xor(ph, row_ph).view(np.uint64)
                    ham = (
                        np.unpackbits(x.view(np.uint8))
                        .reshape(len(idx), 64)
                        .sum(axis=1)
                    )
                    ham_ok = ham <= 8
                cap_ok = np.fromiter(
                    (
                        caps[i]
                        == (
                            f"caption of {img_ids[i]}: deterministic text "
                            + str(
                                (xxhash64_str(str(urls[i])) & 0x7FFFFFFFFFFFFFFF)
                                % 1000
                            )
                        )
                        for i in idxs
                    ),
                    dtype=bool,
                    count=len(idx),
                )
                oks[idx] = pix_ok & ham_ok & cap_ok
        yield pd.DataFrame({"url": pdf["url"].astype(object), "payload_ok": oks})


# --------------------------------------------------------------------------
# Multimodal feature extraction (mapInPandas batch function)
# --------------------------------------------------------------------------

IMAGE_STATS_SCHEMA = "url string, w int, h int, mean_luma_milli long, phash long"


def image_stats_batches(batches):
    import numpy as np
    import pandas as pd

    from ..kernels.imagecodec import decode_image, phash64

    for pdf in batches:
        rows = []
        for url, data in zip(pdf["url"], pdf["bytes"]):
            try:
                px = decode_image(bytes(data))
            except ValueError:
                continue
            rows.append((
                url, int(px.shape[1]), int(px.shape[0]),
                int(px.astype(np.float64).mean() * 1000),
                phash64(px),
            ))
        yield pd.DataFrame(
            rows, columns=["url", "w", "h", "mean_luma_milli", "phash"]
        ).astype({"url": "object", "w": "int32", "h": "int32",
                  "mean_luma_milli": "int64", "phash": "int64"})


# --------------------------------------------------------------------------
# Multimodal resize (mapInPandas batch function)
# --------------------------------------------------------------------------

IMAGE_RESIZE_SCHEMA = "url string, rw int, rh int, mean_luma_milli long"
RESIZE_TARGET = (16, 16)  # (rh, rw)


def image_resize_batches(batches):
    """mapInPandas body: decode → nearest-neighbor resize to RESIZE_TARGET
    → integer mean luma of the thumbnail.  All math is EXACT integers
    (floor-index NN sampling, integer pixel sum, floor-div milli-mean), so
    any engine reproduces the result bit-for-bit — the property the
    independent-decoder oracle mirror checks.  Undecodable payloads are
    skipped (same policy as image_stats_batches)."""
    import numpy as np
    import pandas as pd

    from ..kernels.imagecodec import decode_image

    rh, rw = RESIZE_TARGET
    for pdf in batches:
        rows = []
        for url, data in zip(pdf["url"], pdf["bytes"]):
            try:
                px = decode_image(bytes(data))
            except ValueError:
                continue
            h, w = int(px.shape[0]), int(px.shape[1])
            iy = (np.arange(rh) * h) // rh
            ix = (np.arange(rw) * w) // rw
            thumb = px[iy][:, ix]
            s = int(thumb.astype(np.int64).sum())
            rows.append((url, rw, rh, (s * 1000) // int(thumb.size)))
        yield pd.DataFrame(
            rows, columns=["url", "rw", "rh", "mean_luma_milli"]
        ).astype({"url": "object", "rw": "int32", "rh": "int32",
                  "mean_luma_milli": "int64"})
