"""Constructed-oracle fixtures: expected results precomputed in pure
Python/numpy (no Spark) and written as parquet, so the driver's DuckDB
oracle can hash-check entries whose semantics are not SQL-expressible
(xxhash64-based MinHash/SimHash, float cosine fold order, bloom probes,
the full crawl round loop).

Pattern (proven by ``o2_url_normalize`` in round 1): the expectation is
computed by an INDEPENDENT implementation (the pure-python kernels that are
themselves bit-verified against Spark's JVM builtins in tests/), written to
``/root/repo/.oracle-cache/<name>.parquet``, and the oracle SQL is simply
``SELECT * FROM '<path>'``.  The driver gate runs at sf0.01, so fixtures
are pinned to ``/root/testdata/sf0.01``; the Spark queries themselves stay
parameterized by sf_dir.

Every expectation here derives from public semantics only:
- xxhash64: the public XXH64 spec (kernels/hashing.py, verified vs
  ``F.xxhash64`` in tests/test_hashing.py);
- Spark's fold order for ``F.aggregate`` (sequential left fold) and
  HALF_UP semantics of ``F.round`` (both public Spark API contracts);
- the crawl loop: the pure-python ABWCF oracle (testing/oracle.py, line-
  cited to /root/reference).

Fixtures are deterministic — regeneration always produces identical bytes-
level content (values, not necessarily parquet framing), and files are
committed so the driver never pays generation cost.
"""

from __future__ import annotations

import os
import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from .kernels.hashing import xxhash64_str

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO_ROOT, ".oracle-cache")
SF001 = "/root/testdata/sf0.01"

# tuning shared by the Spark queries and the python mirrors
MINHASH_PERMS = 8
MINHASH_BANDS = 4
MINHASH_BUCKET_CAP = 50       # drop degenerate hot buckets (boilerplate docs)
NGJ_N = 4                     # char n-gram length
NGJ_PERMS = 8
NGJ_BANDS = 4
NGJ_BUCKET_CAP = 50
NGJ_THRESHOLD_MILLI = 500     # near-dup gate on exact char-gram Jaccard
CLUSTER_THRESHOLD_MILLI = 500  # pair-graph edge gate for near-dup clustering
ANN_PLANES = 8
ANN_TOPK = 20
ANN_BATCH_QUERIES = 20
ANN_BATCH_TOPK = 10


def fixture_path(name: str) -> str:
    return os.path.join(FIXTURE_DIR, f"{name}.parquet")


def fixture_sql(name: str) -> str:
    return f"SELECT * FROM '{fixture_path(name)}'"


def _write(name: str, pdf: pd.DataFrame) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    tmp = fixture_path(name) + ".tmp"
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
    os.replace(tmp, fixture_path(name))


def _read_sf001(table: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF001}/{table}.parquet").to_pandas()


# --------------------------------------------------------------------------
# shared text kernels (mirror the Spark expressions token for token)
# --------------------------------------------------------------------------

def tokens_of(text: str) -> list[str]:
    """split(text, '\\s+') with empties dropped — matches F.split + filter."""
    return [t for t in re.split(r"\s+", text) if t]


def shingle_set(text: str) -> set[str]:
    tk = tokens_of(text)
    return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}


def spark_round(x: float, scale: int = 4) -> float:
    """F.round on DoubleType: shortest-repr decimal, HALF_UP."""
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def fold_dot(a, b) -> float:
    """F.aggregate(zip_with(a,b,x*y), 0.0, acc+v): sequential left fold."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def cosine(a, b) -> float:
    import math

    return fold_dot(a, b) / (math.sqrt(fold_dot(a, a)) * math.sqrt(fold_dot(b, b)))


# --------------------------------------------------------------------------
# fixture builders
# --------------------------------------------------------------------------

def build_simhash() -> pd.DataFrame:
    """Mirror of queries.simhash_fingerprint: per-token xxhash64 bit votes."""
    docs = _read_sf001("documents")
    out = []
    for doc_id, text in zip(docs.doc_id, docs.text):
        votes = np.zeros(64, dtype=np.int64)
        for t in tokens_of(text):
            u = np.uint64(xxhash64_str(t) & 0xFFFFFFFFFFFFFFFF)
            bits = (u >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes += np.where(bits.astype(bool), 1, -1)
        if not len(tokens_of(text)):
            continue  # groupBy over zero token rows emits nothing
        u = 0
        for b in range(64):
            if votes[b] > 0:
                u |= 1 << b
        sim = u - (1 << 64) if u >= (1 << 63) else u
        out.append((int(doc_id), sim))
    return pd.DataFrame(out, columns=["doc_id", "simhash"]).astype(
        {"doc_id": "int64", "simhash": "int64"}
    )


def _minhash_sig(ss: set[str]) -> list[int]:
    return [
        min(xxhash64_str(f"p{i}|{s}") for s in ss) for i in range(MINHASH_PERMS)
    ]


def build_minhash() -> pd.DataFrame:
    """Mirror of queries.minhash_lsh_candidates: banded LSH buckets with a
    size cap, candidate pairs, exact-Jaccard confirm (integer milli)."""
    docs = _read_sf001("documents")
    sh = {int(d): shingle_set(t) for d, t in zip(docs.doc_id, docs.text)}
    sigs = {d: _minhash_sig(ss) for d, ss in sh.items() if ss}
    buckets: dict[tuple[int, int], list[int]] = {}
    for d, m in sorted(sigs.items()):
        for b in range(MINHASH_BANDS):
            key = (b, xxhash64_str(f"{b}|{m[2 * b]}|{m[2 * b + 1]}"))
            buckets.setdefault(key, []).append(d)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        if 2 <= len(members) <= MINHASH_BUCKET_CAP:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pairs.add((members[i], members[j]))
    rows = []
    for a, b in sorted(pairs):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        rows.append((a, b, (1000 * inter) // union))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_milli"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard_milli": "int64"}
    )


def char_ngram_set(text: str, n: int = NGJ_N) -> set[str]:
    return {text[i:i + n] for i in range(len(text) - n + 1)}


def build_ngram_jaccard() -> pd.DataFrame:
    """Mirror of queries.ngram_jaccard_pairs: char-4-gram MinHash LSH
    buckets with a size cap, candidate pairs, exact char-gram Jaccard,
    threshold filter (independent pure-python implementation)."""
    docs = _read_sf001("documents")
    g = {int(d): char_ngram_set(t) for d, t in zip(docs.doc_id, docs.text)}
    sigs = {
        d: [min(xxhash64_str(f"q{i}|{s}") for s in ss) for i in range(NGJ_PERMS)]
        for d, ss in g.items() if ss
    }
    buckets: dict[tuple[int, int], list[int]] = {}
    rpb = NGJ_PERMS // NGJ_BANDS
    for d, m in sorted(sigs.items()):
        for b in range(NGJ_BANDS):
            key_str = "|".join([str(b)] + [str(m[rpb * b + r]) for r in range(rpb)])
            buckets.setdefault((b, xxhash64_str(key_str)), []).append(d)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        if 2 <= len(members) <= NGJ_BUCKET_CAP:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pairs.add((members[i], members[j]))
    rows = []
    for a, b in sorted(pairs):
        inter = len(g[a] & g[b])
        union = len(g[a] | g[b])
        jm = (1000 * inter) // union
        if jm >= NGJ_THRESHOLD_MILLI:
            rows.append((a, b, jm))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_milli"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard_milli": "int64"}
    )


def build_cosine_topk() -> pd.DataFrame:
    emb = _read_sf001("embeddings")
    first = int(emb.vec_id.min())
    q = emb.loc[emb.vec_id == first, "embedding"].iloc[0]
    rows = []
    for vid, e in zip(emb.vec_id, emb.embedding):
        if int(vid) == first:
            continue
        rows.append((int(vid), spark_round(cosine(e, q))))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(rows[:ANN_TOPK], columns=["vec_id", "cos_sim"]).astype(
        {"vec_id": "int64", "cos_sim": "float64"}
    )


def _ann_planes(dim: int) -> np.ndarray:
    return np.array(
        [
            [xxhash64_str(f"plane|{p}|{d}") / 2**63 for d in range(dim)]
            for p in range(ANN_PLANES)
        ]
    )


def _ann_sig(e, planes) -> int:
    sig = 0
    for p in range(ANN_PLANES):
        if fold_dot(e, planes[p]) >= 0:
            sig |= 1 << p
    return sig


def build_ann_lsh() -> pd.DataFrame:
    emb = _read_sf001("embeddings")
    dim = len(emb.embedding.iloc[0])
    planes = _ann_planes(dim)
    sigs = {int(v): _ann_sig(e, planes) for v, e in zip(emb.vec_id, emb.embedding)}
    first = int(emb.vec_id.min())
    q = emb.loc[emb.vec_id == first, "embedding"].iloc[0]
    probe = {sigs[first]} | {sigs[first] ^ (1 << p) for p in range(ANN_PLANES)}
    rows = []
    for vid, e in zip(emb.vec_id, emb.embedding):
        vid = int(vid)
        if vid == first or sigs[vid] not in probe:
            continue
        rows.append((vid, spark_round(cosine(e, q))))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(rows[:ANN_TOPK], columns=["vec_id", "cos_sim"]).astype(
        {"vec_id": "int64", "cos_sim": "float64"}
    )


def build_ann_batch() -> pd.DataFrame:
    """Mirror of queries.embedding_ann_batch: query TABLE (lowest vec_ids)
    × multi-probe signature join × per-query exact re-rank."""
    emb = _read_sf001("embeddings")
    dim = len(emb.embedding.iloc[0])
    planes = _ann_planes(dim)
    recs = [(int(v), e) for v, e in zip(emb.vec_id, emb.embedding)]
    sigs = {v: _ann_sig(e, planes) for v, e in recs}
    qids = sorted(sigs)[:ANN_BATCH_QUERIES]
    by_vid = dict(recs)
    rows = []
    for qid in qids:
        probe = {sigs[qid]} | {sigs[qid] ^ (1 << p) for p in range(ANN_PLANES)}
        cand = []
        for vid, e in recs:
            if vid == qid or sigs[vid] not in probe:
                continue
            cand.append((vid, spark_round(cosine(e, by_vid[qid]))))
        cand.sort(key=lambda r: (-r[1], r[0]))
        for rank, (vid, cs) in enumerate(cand[:ANN_BATCH_TOPK], start=1):
            rows.append((qid, vid, cs, rank))
    return pd.DataFrame(
        rows, columns=["q_id", "vec_id", "cos_sim", "rank"]
    ).astype({"q_id": "int64", "vec_id": "int64", "cos_sim": "float64", "rank": "int32"})


def build_crawl_t1_micro() -> pd.DataFrame:
    """The pure-python ABWCF oracle's final frontier on the t1-micro fixture
    (nullable lineage ints coalesced to -1 for cross-engine hash parity)."""
    from .config import CrawlConfig
    from .testing.corpus import T1_MICRO, gen_corpus
    from .testing.oracle import crawl_oracle

    tables = gen_corpus(T1_MICRO)
    res = crawl_oracle(tables["corpus"], tables["robots"], tables["seeds"], CrawlConfig())
    f = res.frontier_df().sort_values("url").reset_index(drop=True)
    f["fetched_round"] = f["fetched_round"].fillna(-1)
    f["fetch_order"] = f["fetch_order"].fillna(-1)
    return f.astype(
        {
            "url": "object", "url_hash": "int64", "host": "object",
            "status": "object", "crawl_depth": "int32",
            "crawl_priority": "int64", "discovered_round": "int32",
            "fetched_round": "int32", "fetch_order": "int64",
        }
    )[
        ["url", "url_hash", "host", "status", "crawl_depth", "crawl_priority",
         "discovered_round", "fetched_round", "fetch_order"]
    ]


def bloom_fixture_bloom():
    """The bloom used by BOTH the o4 query and its fixture: part keys
    divisible by 3 inserted as xxhash64 of their URL string."""
    from .kernels.bloom import BloomFilter

    part = _read_sf001("part")
    keys = [int(k) for k in part.p_partkey if int(k) % 3 == 0]
    bf = BloomFilter.for_capacity(max(len(keys), 1024), 0.01)
    hashes = np.array(
        [xxhash64_str(f"https://bloom-{k}.example/x") for k in keys], dtype=np.int64
    )
    bf.add_hashes(hashes)
    return bf


def image_dedup_corpus() -> pd.DataFrame:
    """Shared by the image_exact_dedup query and its fixture: the T2_MULTI
    image rows plus DETERMINISTIC byte-identical duplicates (every row whose
    url-hash % 4 == 0 re-appears under url + '?mirror=1', same bytes) — two
    crawls of the same image from different URLs, the exact-dedup case."""
    from .testing.corpus import T2_MULTI, gen_corpus

    pdf = gen_corpus(T2_MULTI)["corpus"]
    pdf = pdf[pdf["bytes"].notna()][["url", "bytes"]].reset_index(drop=True)
    dup = pdf[
        pdf["url"].map(lambda u: (xxhash64_str(u) & 0x7FFFFFFFFFFFFFFF) % 4 == 0)
    ].copy()
    dup["url"] = dup["url"] + "?mirror=1"
    return pd.concat([pdf, dup], ignore_index=True)


def build_image_exact_dedup() -> pd.DataFrame:
    """INDEPENDENT mirror of queries.image_exact_dedup: hashlib.md5 + pandas
    groupby (the query side is Spark's jvm md5 over the binary column +
    groupBy — the entry certifies the two hash implementations and the
    dedup shape agree)."""
    import hashlib

    pdf = image_dedup_corpus()
    pdf["content_md5"] = pdf["bytes"].map(
        lambda b: hashlib.md5(bytes(b)).hexdigest()
    )
    g = (
        pdf.groupby("content_md5")
        .agg(n_copies=("url", "size"), canonical_url=("url", "min"))
        .reset_index()
    )
    return g[["content_md5", "canonical_url", "n_copies"]].astype(
        {"content_md5": "object", "canonical_url": "object", "n_copies": "int64"}
    )


def cuckoo_fixture_filter():
    """Fixture-side cuckoo: part keys divisible by 3 inserted (ascending
    key order — cuckoo eviction chains make the table order-sensitive, so
    both sides must insert identically), then keys divisible by 9 DELETED —
    the capability the bloom lacks and the reason this entry exists
    alongside o4_bloom_probe.  queries.o4_cuckoo_probe INTENTIONALLY
    mirrors this construction line-for-line from its own sf_dir (same
    split as o4_bloom_probe vs bloom_fixture_bloom): the query builds from
    the gate's table argument, the fixture from the pinned sf0.01 copy —
    edits must change both or the hash gate fails."""
    from .kernels.cuckoo import CuckooFilter

    part = _read_sf001("part")
    keys = sorted(int(k) for k in part.p_partkey if int(k) % 3 == 0)
    cf = CuckooFilter.for_capacity(max(len(keys), 1024))
    cf.add_hashes(np.array(
        [xxhash64_str(f"https://cuckoo-{k}.example/x") for k in keys],
        dtype=np.int64,
    ))
    gone = [k for k in keys if k % 9 == 0]
    cf.remove_hashes(np.array(
        [xxhash64_str(f"https://cuckoo-{k}.example/x") for k in gone],
        dtype=np.int64,
    ))
    return cf


def build_cuckoo_probe() -> pd.DataFrame:
    cf = cuckoo_fixture_filter()
    part = _read_sf001("part")
    urls = [f"https://cuckoo-{int(k)}.example/x" for k in part.p_partkey]
    hashes = np.array([xxhash64_str(u) for u in urls], dtype=np.int64)
    maybe = cf.might_contain(hashes)
    return pd.DataFrame({"url": urls, "maybe_seen": maybe}).astype(
        {"url": "object", "maybe_seen": "bool"}
    )


def build_bloom_probe() -> pd.DataFrame:
    bf = bloom_fixture_bloom()
    part = _read_sf001("part")
    urls = [f"https://bloom-{int(k)}.example/x" for k in part.p_partkey]
    hashes = np.array([xxhash64_str(u) for u in urls], dtype=np.int64)
    maybe = bf.might_contain(hashes)
    return pd.DataFrame({"url": urls, "maybe_seen": maybe}).astype(
        {"url": "object", "maybe_seen": "bool"}
    )


def o15_corpus() -> pd.DataFrame:
    """Deterministically corrupted image corpus shared by the o15 query and
    its fixture: ~20% of payloads truncated or caption-mangled so the
    validator has real negatives to catch."""
    from .testing.corpus import T2_MULTI, gen_corpus

    pdf = gen_corpus(T2_MULTI)["corpus"]
    pdf = pdf[pdf["bytes"].notna()].reset_index(drop=True)

    def corrupt(row):
        h = xxhash64_str(row["url"]) & 0x7FFFFFFFFFFFFFFF
        if h % 10 == 0:
            row["bytes"] = row["bytes"][: max(len(row["bytes"]) - 7, 1)]
        elif h % 10 == 1:
            row["caption"] = row["caption"] + " (tampered)"
        return row

    return pdf.apply(corrupt, axis=1)


# --------------------------------------------------------------------------
# Independent image-decoder mirror (closes the round-2 oracle self-reference:
# these fixtures previously ran the SAME kernel as the query, proving only
# the Arrow plumbing).  Everything below re-implements the public formats —
# PNG (RFC 2083 subset) and the deterministic ABWL lossy container — without
# importing kernels/imagecodec's decode path; pixel math (unfilter, luma,
# a-hash, PSNR) is written independently (exact-integer / Fraction
# arithmetic where the kernel uses numpy float reductions).
# --------------------------------------------------------------------------

def _mirror_decode_png(data: bytes) -> np.ndarray:
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not png")
    pos, w, h = 8, None, None
    idat = []
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            if body[8] != 8 or body[9] != 2 or body[12] != 0:
                raise ValueError("unsupported png subset")
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("bad scanline payload")
    out = bytearray(h * stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        base = y * stride
        for i in range(stride):
            a = out[base + i - 3] if i >= 3 else 0
            b = out[base - stride + i] if y > 0 else 0
            c = out[base - stride + i - 3] if (y > 0 and i >= 3) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                raise ValueError(f"bad filter {f}")
            out[base + i] = (line[i] + pred) & 0xFF
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, 3)


def _mirror_decode_lossy(data: bytes) -> np.ndarray:
    import struct
    import zlib

    if data[:4] != b"ABWL":
        raise ValueError("not abwl")
    w, h, step = struct.unpack(">IIB", data[8:17])
    q = zlib.decompress(data[17:])
    if len(q) != h * w * 3:
        raise ValueError("bad quant payload")
    px = np.frombuffer(q, dtype=np.uint8).astype(np.int64) * int(step)
    return np.minimum(px, 255).astype(np.uint8).reshape(h, w, 3)


def mirror_decode(data: bytes) -> np.ndarray:
    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            return _mirror_decode_png(data)
        if data[:4] == b"ABWL":
            return _mirror_decode_lossy(data)
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(f"corrupt: {e}") from e
    raise ValueError("unknown container")


def _mirror_phash(px: np.ndarray) -> int:
    """64-bit average hash via EXACT integer/Fraction arithmetic (the kernel
    uses float64 means; both resolve identically away from exact ties)."""
    from fractions import Fraction

    h, w, _ = px.shape
    rgbsum = px.astype(np.int64).sum(axis=2)  # 3×gray, exact ints
    blocks = []
    for i in range(8):
        y0, y1 = (i * h) // 8, ((i + 1) * h) // 8
        y1 = max(y1, y0 + 1)
        for j in range(8):
            x0, x1 = (j * w) // 8, ((j + 1) * w) // 8
            x1 = max(x1, x0 + 1)
            cell = rgbsum[y0:y1, x0:x1]
            blocks.append(Fraction(int(cell.sum()), cell.size * 3))
    mean = sum(blocks, Fraction(0)) / 64
    v = 0
    for b in blocks:
        v = (v << 1) | int(b > mean)
    return v - (1 << 64) if v >= (1 << 63) else v


def _mirror_psnr_ge(a: np.ndarray, ref: np.ndarray, threshold_db: float) -> bool:
    """PSNR ≥ threshold via exact-integer MSE (sum of squared diffs is
    exact; the comparison is mse ≤ 255² / 10^(t/10))."""
    if a.shape != ref.shape:
        return False
    diff = a.astype(np.int64) - ref.astype(np.int64)
    sse = int((diff * diff).sum())
    n = diff.size
    # psnr >= t  ⟺  mse <= 255^2 / 10^(t/10)  ⟺  sse * 10^(t/10) <= 255^2 * n
    return sse * (10.0 ** (threshold_db / 10.0)) <= 255.0 * 255.0 * n


def build_payload_validate() -> pd.DataFrame:
    """Mirror of the o15 payload validator: decode with the INDEPENDENT
    decoder above, PSNR/phash/caption checks in exact arithmetic — the
    driver gate now checks the kernel's decode/validate semantics, not just
    that mapInPandas moved the bytes."""
    from .kernels.imagecodec import gen_pixels  # corpus DEFINITION, not decode

    pdf = o15_corpus()[
        ["url", "bytes", "image_id", "w", "h", "fmt", "caption", "phash"]
    ]
    oks = []
    for row in pdf.itertuples(index=False):
        try:
            px = mirror_decode(bytes(row.bytes))
        except ValueError:
            oks.append(False)
            continue
        ref = gen_pixels(str(row.image_id), int(row.w), int(row.h))
        if row.fmt == "png":
            pix_ok = px.shape == ref.shape and bool((px == ref).all())
            ham_ok = _mirror_phash(px) == int(row.phash)
        else:
            pix_ok = _mirror_psnr_ge(px, ref, 40.0)
            ham = bin(
                (_mirror_phash(px) ^ int(row.phash)) & ((1 << 64) - 1)
            ).count("1")
            ham_ok = ham <= 8
        expected_caption = (
            f"caption of {row.image_id}: deterministic text "
            + str((xxhash64_str(str(row.url)) & 0x7FFFFFFFFFFFFFFF) % 1000)
        )
        oks.append(pix_ok and ham_ok and row.caption == expected_caption)
    return pd.DataFrame(
        {"url": pdf["url"].astype(object), "payload_ok": oks}
    ).astype({"url": "object", "payload_ok": "bool"})


WINNOW_K = 8   # char k-gram length
WINNOW_W = 4   # window of consecutive gram hashes; min per window kept


def build_winnow() -> pd.DataFrame:
    """Mirror of queries.doc_fingerprint_winnow: winnowing fingerprints —
    per-window minimum of xxhash64 over consecutive char 8-grams."""
    docs = _read_sf001("documents")
    rows = []
    for doc_id, text in zip(docs.doc_id, docs.text):
        n = len(text)
        if n < WINNOW_K:
            continue
        grams = [
            xxhash64_str(text[i : i + WINNOW_K]) for i in range(n - WINNOW_K + 1)
        ]
        if len(grams) < WINNOW_W:
            continue
        fps = sorted(
            {
                min(grams[j : j + WINNOW_W])
                for j in range(len(grams) - WINNOW_W + 1)
            }
        )
        for fp in fps:
            rows.append((int(doc_id), fp))
    return pd.DataFrame(rows, columns=["doc_id", "fingerprint"]).astype(
        {"doc_id": "int64", "fingerprint": "int64"}
    )


def build_image_stats() -> pd.DataFrame:
    """Mirror of queries.image_stats_extract computed by the INDEPENDENT
    decoder (mirror_decode/_mirror_phash above — exact-integer pixel math),
    NOT the engine kernel: the driver gate checks decode semantics."""
    from .testing.corpus import T2_MULTI, gen_corpus

    pdf = gen_corpus(T2_MULTI)["corpus"]
    pdf = pdf[pdf["bytes"].notna()][["url", "bytes"]].reset_index(drop=True)
    rows = []
    for url, data in zip(pdf["url"], pdf["bytes"]):
        try:
            px = mirror_decode(bytes(data))
        except ValueError:
            continue
        total, n = int(px.astype(np.int64).sum()), px.size
        # exact int sum / exact count → identical float64 mean as the kernel
        rows.append((
            url, int(px.shape[1]), int(px.shape[0]),
            int(float(total) / n * 1000), _mirror_phash(px),
        ))
    return pd.DataFrame(
        rows, columns=["url", "w", "h", "mean_luma_milli", "phash"]
    ).astype({"url": "object", "w": "int32", "h": "int32",
              "mean_luma_milli": "int64", "phash": "int64"})


def build_near_dup_clusters() -> pd.DataFrame:
    """Mirror of queries.near_dup_clusters: INDEPENDENT union-find over the
    mirror's own MinHash pair list (build_minhash — not the Spark output)
    at CLUSTER_THRESHOLD_MILLI, every document labeled with its component
    minimum, the component size, and the canonical flag.  The Spark side
    computes components with alternating large-star/small-star — a union-
    find would be driver-bound at scale, so the mirror's simplicity IS the
    independence."""
    docs = _read_sf001("documents")
    all_ids = sorted(int(d) for d in docs.doc_id)
    parent: dict[int, int] = {d: d for d in all_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs = build_minhash()
    for a, b, jm in zip(pairs.doc_a, pairs.doc_b, pairs.jaccard_milli):
        if int(jm) >= CLUSTER_THRESHOLD_MILLI:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # union by MIN id keeps the representative the component min
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    comp = {d: find(d) for d in all_ids}
    sizes: dict[int, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    rows = [
        (d, comp[d], sizes[comp[d]], d == comp[d]) for d in all_ids
    ]
    return pd.DataFrame(
        rows, columns=["doc_id", "cluster_id", "cluster_size", "is_canonical"]
    ).astype({
        "doc_id": "int64", "cluster_id": "int64",
        "cluster_size": "int64", "is_canonical": "bool",
    })


BUILDERS = {
    "doc_fingerprint_winnow": build_winnow,
    "image_stats_extract": build_image_stats,
    "simhash_fingerprint": build_simhash,
    "minhash_lsh_candidates": build_minhash,
    "embedding_cosine_topk": build_cosine_topk,
    "embedding_ann_lsh": build_ann_lsh,
    "embedding_ann_batch": build_ann_batch,
    "crawl_t1_micro": build_crawl_t1_micro,
    "o4_bloom_probe": build_bloom_probe,
    "o4_cuckoo_probe": build_cuckoo_probe,
    "image_exact_dedup": build_image_exact_dedup,
    "o15_payload_validate": build_payload_validate,
    "near_dup_clusters": build_near_dup_clusters,
}


def ensure_fixtures(force: bool = False) -> None:
    for name, builder in BUILDERS.items():
        if force or not os.path.exists(fixture_path(name)):
            _write(name, builder())



EMB_BUCKET_CAP = 100  # signature-bucket size cap for the near-dup self-join
EMB_CLUSTER_THRESHOLD_MILLI = 300  # edge gate for embedding cluster view


def build_emb_near_dup() -> pd.DataFrame:
    """Mirror of queries.embedding_near_dup_pairs: pairs whose signatures
    match exactly OR differ by one bit (Hamming-1 multi-probe), both
    endpoints from buckets within the cap, with exact fold-order cosine in
    floor-milli."""
    import math

    emb = _read_sf001("embeddings")
    dim = len(emb.embedding.iloc[0])
    planes = _ann_planes(dim)
    recs = [(int(v), e) for v, e in zip(emb.vec_id, emb.embedding)]
    sigs = {v: _ann_sig(e, planes) for v, e in recs}
    buckets: dict[int, list[int]] = {}
    for v, _ in recs:
        buckets.setdefault(sigs[v], []).append(v)
    ok = {s for s, m in buckets.items() if len(m) <= EMB_BUCKET_CAP}
    by_vid = dict(recs)
    pairs: set[tuple[int, int]] = set()
    for v, _ in recs:
        s = sigs[v]
        if s not in ok:
            continue
        for probe in [s] + [s ^ (1 << p) for p in range(ANN_PLANES)]:
            if probe not in ok:
                continue
            for w in buckets.get(probe, ()):
                if w != v:
                    pairs.add((min(v, w), max(v, w)))
    rows = [
        (a, b, math.floor(cosine(by_vid[a], by_vid[b]) * 1000))
        for a, b in sorted(pairs)
    ]
    return pd.DataFrame(rows, columns=["vec_a", "vec_b", "cos_milli"]).astype(
        {"vec_a": "int64", "vec_b": "int64", "cos_milli": "int64"}
    )


BUILDERS["embedding_near_dup_pairs"] = build_emb_near_dup


def _metrics_long_rows(m: dict) -> list[tuple]:
    """INDEPENDENT long-format stage shaping for the o20 fixture (VERDICT-r3
    #5: the round-3 fixture imported the engine's metrics_stage_rows for
    shaping, so a formatting bug there would have been invisible to the
    gate).  Restates the documented mapping — per-stage passed/rejected from
    the simulator's round dict (FilterMetrics.scala:176-182 passed/rejected
    per filter; FetcherMetrics.scala:130-145 fetch counters;
    CacheMetrics.scala:53-69 entity-count gauges in `passed`)."""
    rnd = int(m["round"])
    out: list[tuple] = []

    def row(stage, passed, rejected=0):
        if passed is None:
            return
        out.append((rnd, stage, int(passed), int(rejected)))

    c, n = m.get("candidates"), m.get("normalized")
    nu, lp = m.get("new_urls"), m.get("lenient_passed")
    if c is not None and n is not None:
        row("normalize", n, c - n)
    if n is not None and nu is not None:
        row("url_seen", nu, n - nu)
    if nu is not None and lp is not None:
        row("lenient_robots", lp, nu - lp)
    row("robots_fetch", m.get("robots_fetched"))
    ins = m.get("inserted")
    dis = m.get("disallowed", 0)
    if ins is not None:
        row("strict_insert", ins - dis, dis)
    row("fetch", m.get("fetched"))
    row("emit", m.get("emitted"))
    row("gauge_hosts_rows", m.get("hosts_rows"))
    row("gauge_frontier_rows", m.get("frontier_rows"))
    return out


def build_metrics_table() -> pd.DataFrame:
    """Mirror of queries.o20_metrics_table: the pure-python simulator's
    per-round metric COUNTS mapped through the independent long-format
    shaping above — both the counts AND the formatting now come from the
    mirror side."""
    from .config import CrawlConfig
    from .testing.corpus import T1_MICRO, gen_corpus
    from .testing.oracle import crawl_oracle

    tables = gen_corpus(T1_MICRO)
    res = crawl_oracle(tables["corpus"], tables["robots"], tables["seeds"],
                       CrawlConfig())
    rows = [r for m in res.metrics for r in _metrics_long_rows(m)]
    pdf = pd.DataFrame(rows, columns=["round", "stage", "passed", "rejected"])
    return pdf.astype({
        "round": "int32", "stage": "object",
        "passed": "int64", "rejected": "int64",
    })


BUILDERS["o20_metrics_table"] = build_metrics_table
BUILDERS["ngram_jaccard_pairs"] = build_ngram_jaccard


# --------------------------------------------------------------------------
# pHash near-duplicate pairs (image modality).  Shared tuning + input
# builder + INDEPENDENT brute-force mirror.
# --------------------------------------------------------------------------

PHASH_BANDS = 4          # 4 × 16-bit bands over the 64-bit perceptual hash
PHASH_MAX_HAMMING = 3    # pigeonhole: ≤3 differing bits ⇒ ≥1 band intact
PHASH_BUCKET_CAP = 64    # skew guard; the fixture builder asserts non-binding

_U64 = (1 << 64) - 1


def _phash_u(ph: int) -> int:
    return int(ph) & _U64


def phash_corpus() -> pd.DataFrame:
    """(image_id, phash) input shared by the query and its mirror: every
    REAL generated image of the T2 corpus (phash64 over its actual pixels),
    plus deterministic 're-capture' variants whose hash differs by 0-3 bits
    — the near-dup positives a second crawl of the same image produces."""
    from .testing.corpus import T2_MULTI, gen_corpus

    pdf = gen_corpus(T2_MULTI)["corpus"]
    pdf = pdf[pdf["bytes"].notna()][["image_id", "phash"]].reset_index(drop=True)
    rows = [(str(i), int(p)) for i, p in zip(pdf.image_id, pdf.phash)]
    out = list(rows)
    for iid, ph in rows:
        h = xxhash64_str(f"phdup|{iid}") & 0x7FFFFFFFFFFFFFFF
        if h % 3 != 0:
            continue
        k = (h >> 8) % (PHASH_MAX_HAMMING + 1)
        pos: list[int] = []
        j = 0
        while len(pos) < k:
            p = xxhash64_str(f"phflip|{iid}|{j}") % 64
            if p not in pos:
                pos.append(p)
            j += 1
        u = _phash_u(ph)
        for p in pos:
            u ^= 1 << p
        signed = u - (1 << 64) if u >= (1 << 63) else u
        out.append((f"{iid}~v", signed))
    return pd.DataFrame(out, columns=["image_id", "phash"]).astype(
        {"image_id": "object", "phash": "int64"}
    )


def build_phash_near_dup() -> pd.DataFrame:
    """INDEPENDENT mirror of queries.phash_near_dup_pairs: brute-force
    O(n²) popcount over the shared input — no banding, no buckets — valid
    because Hamming ≤ PHASH_MAX_HAMMING guarantees a shared 16-bit band
    (pigeonhole over PHASH_BANDS bands) and the builder ASSERTS the bucket
    cap never binds at fixture scale, so the banded query must find
    exactly the brute-force pair set."""
    from collections import Counter

    pdf = phash_corpus()
    recs = [(str(i), _phash_u(p)) for i, p in zip(pdf.image_id, pdf.phash)]
    cnt = Counter(
        (b, (u >> (16 * b)) & 0xFFFF) for _, u in recs for b in range(PHASH_BANDS)
    )
    assert max(cnt.values()) <= PHASH_BUCKET_CAP, "bucket cap binds; fixture invalid"
    rows = []
    for x in range(len(recs)):
        ia, ua = recs[x]
        for y in range(x + 1, len(recs)):
            ib, ub = recs[y]
            ham = bin(ua ^ ub).count("1")
            if ham <= PHASH_MAX_HAMMING:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                rows.append((a, b, ham))
    assert rows, "no near-dup pairs generated; fixture invalid"
    return pd.DataFrame(rows, columns=["image_a", "image_b", "hamming"]).astype(
        {"image_a": "object", "image_b": "object", "hamming": "int64"}
    )


BUILDERS["phash_near_dup_pairs"] = build_phash_near_dup


def phash_chain_corpus() -> pd.DataFrame:
    """(image_id, bytes) input shared by the decode-chain query and its
    mirror: every decodable T2 image, plus — for the xxhash-selected third
    of ids — a 're-capture' variant re-encoded from the same pixels in the
    NEXT lossy format (a second crawl of the same image: decoded pixels
    differ slightly, phash 0-1 bits apart)."""
    from .kernels.imagecodec import encode_image, gen_pixels
    from .testing.corpus import FMTS, T2_MULTI, gen_corpus

    pdf = gen_corpus(T2_MULTI)["corpus"]
    pdf = pdf[pdf["bytes"].notna()][
        ["image_id", "bytes", "w", "h", "fmt"]
    ].reset_index(drop=True)
    rows = [(str(i), bytes(b)) for i, b in zip(pdf.image_id, pdf.bytes)]
    for _, r in pdf.iterrows():
        iid = str(r.image_id)
        if xxhash64_str(f"phchain|{iid}") % 3 != 0:
            continue
        fmt2 = FMTS[(FMTS.index(str(r.fmt)) + 1) % len(FMTS)]
        px = gen_pixels(iid, int(r.w), int(r.h))
        rows.append((f"{iid}~r", encode_image(px, fmt2)))
    return pd.DataFrame(rows, columns=["image_id", "bytes"]).astype(
        {"image_id": "object", "bytes": "object"}
    )


def build_phash_chain() -> pd.DataFrame:
    """INDEPENDENT mirror of queries.phash_bytes_chain_pairs: every hash
    recomputed from the same bytes via the independent decoder
    (mirror_decode + _mirror_phash — NOT the engine codec), then brute-
    force O(n²) popcount.  Asserts the band-bucket cap never binds and
    that re-encode variants actually produce pairs."""
    from collections import Counter

    pdf = phash_chain_corpus()
    recs = []
    for iid, data in zip(pdf.image_id, pdf.bytes):
        try:
            px = mirror_decode(bytes(data))
        except ValueError:
            continue
        recs.append((str(iid), _phash_u(_mirror_phash(px))))
    cnt = Counter(
        (b, (u >> (16 * b)) & 0xFFFF) for _, u in recs for b in range(PHASH_BANDS)
    )
    assert max(cnt.values()) <= PHASH_BUCKET_CAP, "bucket cap binds; fixture invalid"
    rows = []
    for x in range(len(recs)):
        ia, ua = recs[x]
        for y in range(x + 1, len(recs)):
            ib, ub = recs[y]
            ham = bin(ua ^ ub).count("1")
            if ham <= PHASH_MAX_HAMMING:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                rows.append((a, b, ham))
    assert rows, "no chain near-dup pairs; fixture invalid"
    return pd.DataFrame(rows, columns=["image_a", "image_b", "hamming"]).astype(
        {"image_a": "object", "image_b": "object", "hamming": "int64"}
    )


BUILDERS["phash_bytes_chain_pairs"] = build_phash_chain


# --------------------------------------------------------------------------
# IVF ANN (coarse-quantizer cells + multi-cell probe): shared tuning +
# mirror.  Centroids are the IVF_K lowest-vec_id vectors (deterministic,
# no aggregation → bit-identical on both engines); a k-means refinement is
# a production extension that would need order-stable averaging.
# --------------------------------------------------------------------------

IVF_K = 16
IVF_PROBES = 4
IVF_TOPK = 20
IVF_ITERS = 2  # fixed Lloyd iterations; recall plateaus here on the fixture


def _half_up_div(a: int, n: int) -> int:
    """round-half-away-from-zero of a/n (the rule both engines implement
    for the integer-micro centroid means — matches Spark ROUND semantics)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int((Decimal(a) / Decimal(n)).quantize(Decimal(1),
                                                  rounding=ROUND_HALF_UP))


def mirror_ivf_centroids(recs) -> list[list[float]]:
    """Deterministic Lloyd refinement, pure-python mirror: seed with the
    IVF_K lowest-vec_id vectors, then IVF_ITERS rounds of (argmax-cosine
    assignment, tie → larger cell) + integer-MICRO means — each component
    is HALF_UP(x·1e6) summed exactly as ints, divided half-up by the
    member count, back to double as micros/1e6.  Integer sums are
    order-independent, so any engine (here: Spark's distributed
    per-(cell,dim) long sums) reproduces the same centroids bit-exactly.
    Empty cells keep their previous centroid."""
    cents = [e for _, e in recs[:IVF_K]]
    dim = len(cents[0])
    for _ in range(IVF_ITERS):
        sums: dict[int, list[int]] = {}
        cnt: dict[int, int] = {}
        for _vid, e in recs:
            c = max((cosine(e, cv), ci) for ci, cv in enumerate(cents))[1]
            cnt[c] = cnt.get(c, 0) + 1
            acc = sums.setdefault(c, [0] * dim)
            for d, x in enumerate(e):
                acc[d] += int(spark_round(float(x) * 1e6, 0))
        cents = [
            [_half_up_div(sums[c][d], cnt[c]) / 1e6 for d in range(dim)]
            if c in cnt else cents[c]
            for c in range(IVF_K)
        ]
    return cents


def build_ann_ivf() -> pd.DataFrame:
    """Mirror of queries.embedding_ann_ivf: Lloyd-refined centroids
    (mirror_ivf_centroids), cell assignment = argmax cosine (ties → larger
    cell id, matching array_max's lexicographic struct order), probe the
    IVF_PROBES cells nearest the query, exact fold-order cosine re-rank of
    the probed cells' members."""
    emb = _read_sf001("embeddings")
    recs = sorted(
        (int(v), [float(x) for x in e]) for v, e in zip(emb.vec_id, emb.embedding)
    )
    cents = mirror_ivf_centroids(recs)

    def cell_of(e) -> int:
        return max((cosine(e, cv), c) for c, cv in enumerate(cents))[1]

    qid, qv = recs[0]
    order = sorted(
        ((cosine(qv, cv), c) for c, cv in enumerate(cents)),
        key=lambda t: (-t[0], t[1]),
    )
    probe = {c for _, c in order[:IVF_PROBES]}
    rows = []
    for vid, e in recs:
        if vid == qid:
            continue
        c = cell_of(e)
        if c not in probe:
            continue
        rows.append((vid, c, spark_round(cosine(e, qv))))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return pd.DataFrame(
        rows[:IVF_TOPK], columns=["vec_id", "cell", "cos_sim"]
    ).astype({"vec_id": "int64", "cell": "int32", "cos_sim": "float64"})


BUILDERS["embedding_ann_ivf"] = build_ann_ivf


def build_ann_ivf_batch() -> pd.DataFrame:
    """Mirror of queries.embedding_ann_ivf_batch: lowest-vec_id query
    table, per-query probe = IVF_PROBES cells by (cosine desc, cell asc),
    candidates = corpus vectors whose refined-centroid cell is probed,
    exact fold-order cosine re-rank per query."""
    emb = _read_sf001("embeddings")
    recs = sorted(
        (int(v), [float(x) for x in e]) for v, e in zip(emb.vec_id, emb.embedding)
    )
    cents = mirror_ivf_centroids(recs)
    cell = {
        vid: max((cosine(e, cv), c) for c, cv in enumerate(cents))[1]
        for vid, e in recs
    }
    by_vid = dict(recs)
    rows = []
    for qid, qv in recs[:ANN_BATCH_QUERIES]:
        order = sorted(
            ((cosine(qv, cv), c) for c, cv in enumerate(cents)),
            key=lambda t: (-t[0], t[1]),
        )
        probe = {c for _, c in order[:IVF_PROBES]}
        cand = [
            (vid, spark_round(cosine(by_vid[vid], qv)))
            for vid, _ in recs
            if vid != qid and cell[vid] in probe
        ]
        cand.sort(key=lambda r: (-r[1], r[0]))
        for rank, (vid, cs) in enumerate(cand[:ANN_BATCH_TOPK], start=1):
            rows.append((qid, vid, cs, rank))
    return pd.DataFrame(
        rows, columns=["q_id", "vec_id", "cos_sim", "rank"]
    ).astype({"q_id": "int64", "vec_id": "int64", "cos_sim": "float64",
              "rank": "int32"})


BUILDERS["embedding_ann_ivf_batch"] = build_ann_ivf_batch


def build_image_resize() -> pd.DataFrame:
    """Mirror of queries.image_resize_stats via the INDEPENDENT decoder
    (mirror_decode) and pure-integer NN resize: floor-index sampling,
    integer pixel sum, floor-div milli-mean — bit-exact by construction."""
    from .operators.udfs import RESIZE_TARGET
    from .testing.corpus import T2_MULTI, gen_corpus

    rh, rw = RESIZE_TARGET
    pdf = gen_corpus(T2_MULTI)["corpus"]
    pdf = pdf[pdf["bytes"].notna()][["url", "bytes"]].reset_index(drop=True)
    rows = []
    for url, data in zip(pdf["url"], pdf["bytes"]):
        try:
            px = mirror_decode(bytes(data))
        except ValueError:
            continue
        h, w = int(px.shape[0]), int(px.shape[1])
        nchan = int(px.shape[2]) if px.ndim == 3 else 1
        total = 0
        for y in range(rh):
            sy = (y * h) // rh
            for x in range(rw):
                sample = px[sy][(x * w) // rw]
                total += (
                    sum(int(v) for v in sample) if nchan > 1 else int(sample)
                )
        rows.append((url, rw, rh, (total * 1000) // (rh * rw * nchan)))
    return pd.DataFrame(
        rows, columns=["url", "rw", "rh", "mean_luma_milli"]
    ).astype({"url": "object", "rw": "int32", "rh": "int32",
              "mean_luma_milli": "int64"})


BUILDERS["image_resize_stats"] = build_image_resize


# --------------------------------------------------------------------------
# Passage/substring-level dedup: repeated SPANS across documents
# (boilerplate, licenses, templated paragraphs) that doc-level Jaccard
# scores below threshold.  Reuses the winnowing tuning (WINNOW_K char
# grams, WINNOW_W windows); a span is the merge of the char intervals
# covered by fingerprint windows whose fingerprint appears in >= 2
# distinct documents.
# --------------------------------------------------------------------------

SPAN_MIN_LEN = 20    # emitted spans must cover at least this many chars
SPAN_BOILER_DF = 50  # strip gate: fingerprint shared by >=10% of the corpus


def mirror_dup_spans(doc_texts, min_df: int = 2) -> list[tuple[int, int, int]]:
    """Pure-python mirror of queries.dup_spans over (doc_id, text) pairs:
    winnowing fingerprints with window positions, cross-doc shared set,
    per-doc interval merge.  Shared by the gate fixture (sf0.01 documents)
    and the constructed-span unit tests."""
    L = WINNOW_W + WINNOW_K - 2  # a window at gram j covers chars [j, j+L]
    per_doc: dict[int, list[int]] = {}
    fp_docs: dict[int, set[int]] = {}
    for doc_id, text in doc_texts:
        n = len(text)
        if n < WINNOW_K + WINNOW_W - 1:
            continue
        grams = [
            xxhash64_str(text[i : i + WINNOW_K]) for i in range(n - WINNOW_K + 1)
        ]
        wins = [
            min(grams[j : j + WINNOW_W])
            for j in range(len(grams) - WINNOW_W + 1)
        ]
        per_doc[int(doc_id)] = wins
        for fp in set(wins):
            fp_docs.setdefault(fp, set()).add(int(doc_id))
    shared = {fp for fp, ds in fp_docs.items() if len(ds) >= min_df}
    rows = []
    for doc_id in sorted(per_doc):
        spans: list[list[int]] = []
        for j, fp in enumerate(per_doc[doc_id]):
            if fp not in shared:
                continue
            if spans and j <= spans[-1][1] + 1:
                spans[-1][1] = j + L
            else:
                spans.append([j, j + L])
        for s, e in spans:
            if e - s + 1 >= SPAN_MIN_LEN:
                rows.append((doc_id, s, e - s + 1))
    return rows


def build_dup_spans() -> pd.DataFrame:
    docs = _read_sf001("documents")
    rows = mirror_dup_spans(
        (int(d), str(t)) for d, t in zip(docs.doc_id, docs.text)
    )
    return pd.DataFrame(
        rows, columns=["doc_id", "span_start", "span_len"]
    ).astype({"doc_id": "int64", "span_start": "int64", "span_len": "int64"})


BUILDERS["dup_span_extract"] = build_dup_spans


def build_dup_span_strip() -> pd.DataFrame:
    """Mirror of queries.dup_span_strip: cut the mirror's own merged span
    list (at the SPAN_BOILER_DF boilerplate gate) out of each document by
    plain python slicing."""
    docs = _read_sf001("documents")
    texts = {int(d): str(t) for d, t in zip(docs.doc_id, docs.text)}
    spans: dict[int, list[tuple[int, int]]] = {}
    for doc_id, s, n in mirror_dup_spans(texts.items(), min_df=SPAN_BOILER_DF):
        spans.setdefault(doc_id, []).append((s, n))
    rows = []
    for doc_id, text in texts.items():
        sp = sorted(spans.get(doc_id, []))
        acc, pos = [], 0
        for s, n in sp:
            acc.append(text[pos:s])
            pos = s + n
        acc.append(text[pos:])
        rows.append((doc_id, "".join(acc), len(sp), sum(n for _, n in sp)))
    return pd.DataFrame(
        rows, columns=["doc_id", "clean_text", "n_spans", "removed_chars"]
    ).astype({"doc_id": "int64", "clean_text": "object",
              "n_spans": "int32", "removed_chars": "int64"})


BUILDERS["dup_span_strip"] = build_dup_span_strip


def build_emb_near_dup_clusters() -> pd.DataFrame:
    """Mirror of queries.embedding_near_dup_clusters: INDEPENDENT
    union-find over the mirror's OWN pair list (build_emb_near_dup — not
    the Spark output) gated at EMB_CLUSTER_THRESHOLD_MILLI, min-id rep."""
    emb = _read_sf001("embeddings")
    ids = sorted(int(v) for v in emb.vec_id)
    pairs = build_emb_near_dup()
    parent = {v: v for v in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, c in zip(pairs.vec_a, pairs.vec_b, pairs.cos_milli):
        if int(c) < EMB_CLUSTER_THRESHOLD_MILLI:
            continue
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    comp = {v: find(v) for v in ids}
    sizes: dict[int, int] = {}
    for v in ids:
        sizes[comp[v]] = sizes.get(comp[v], 0) + 1
    rows = [(v, comp[v], sizes[comp[v]], v == comp[v]) for v in ids]
    return pd.DataFrame(
        rows, columns=["vec_id", "cluster_id", "cluster_size", "is_canonical"]
    ).astype({"vec_id": "int64", "cluster_id": "int64",
              "cluster_size": "int64", "is_canonical": "bool"})


BUILDERS["embedding_near_dup_clusters"] = build_emb_near_dup_clusters


def build_phash_clusters() -> pd.DataFrame:
    """Mirror of queries.image_near_dup_clusters: INDEPENDENT union-find
    over the brute-force popcount mirror's pair list (build_phash_near_dup
    — not the Spark output), min-string-id representative."""
    ids = sorted(str(i) for i in phash_corpus().image_id)
    pairs = build_phash_near_dup()
    parent = {v: v for v in ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.image_a, pairs.image_b):
        ra, rb = find(str(a)), find(str(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    comp = {v: find(v) for v in ids}
    sizes: dict[str, int] = {}
    for v in ids:
        sizes[comp[v]] = sizes.get(comp[v], 0) + 1
    rows = [(v, comp[v], sizes[comp[v]], v == comp[v]) for v in ids]
    return pd.DataFrame(
        rows, columns=["image_id", "cluster_id", "cluster_size", "is_canonical"]
    ).astype({"image_id": "object", "cluster_id": "object",
              "cluster_size": "int64", "is_canonical": "bool"})


BUILDERS["image_near_dup_clusters"] = build_phash_clusters


def build_training_pipeline() -> pd.DataFrame:
    """Mirror of queries.training_pipeline_sample: chain the independent
    mirrors — span strip (build_dup_span_strip) → the literal
    spaces-plus-one token formula on the cleaned text → n_tokens >= 16 →
    md5(doc_id || ':pipe')[:2] threshold per language."""
    import hashlib

    docs = _read_sf001("documents")
    meta = {int(d): (str(la), str(so))
            for d, la, so in zip(docs.doc_id, docs.lang, docs.source)}
    rows = []
    for r in build_dup_span_strip().itertuples(index=False):
        s = str(r.clean_text)
        n_tokens = len(s) - len(s.replace(" ", "")) + 1
        if n_tokens < 16:
            continue
        lang, source = meta[int(r.doc_id)]
        bucket = hashlib.md5(f"{int(r.doc_id)}:pipe".encode()).hexdigest()[:2]
        if bucket >= ("60" if lang == "en" else "a0"):
            continue
        rows.append((int(r.doc_id), lang, source, n_tokens,
                     int(r.n_spans), int(r.removed_chars)))
    return pd.DataFrame(
        rows, columns=["doc_id", "lang", "source", "n_tokens",
                       "n_spans", "removed_chars"]
    ).astype({"doc_id": "int64", "lang": "object", "source": "object",
              "n_tokens": "int64", "n_spans": "int32",
              "removed_chars": "int64"})


BUILDERS["training_pipeline_sample"] = build_training_pipeline


def build_export_roundtrip() -> pd.DataFrame:
    """Mirror of queries.export_roundtrip: per-lang aggregates of the
    training-pipeline mirror.  The export sink must land exactly the
    sampled rows on disk, so the read-back aggregate AND the manifest
    row count both equal the mirror's per-lang totals."""
    tp = build_training_pipeline()
    g = (
        tp.groupby("lang", as_index=False)
        .agg(
            n_docs=("doc_id", "count"),
            sum_tokens=("n_tokens", "sum"),
            sum_removed=("removed_chars", "sum"),
        )
    )
    g["manifest_rows"] = g["n_docs"]
    return g.astype(
        {"lang": "object", "n_docs": "int64", "sum_tokens": "int64",
         "sum_removed": "int64", "manifest_rows": "int64"}
    )


BUILDERS["export_roundtrip"] = build_export_roundtrip


def build_keep_best() -> pd.DataFrame:
    """Mirror of queries.near_dup_keep_best: chain the independent cluster
    mirror (build_near_dup_clusters — union-find over the mirror's own
    MinHash pairs) with the plain spaces-plus-one token count, then pick
    per cluster the member with the most tokens (ties → lowest doc_id)."""
    docs = _read_sf001("documents")
    ntok = {int(d): str(t).count(" ") + 1 for d, t in zip(docs.doc_id, docs.text)}
    cl = build_near_dup_clusters()
    best: dict[int, tuple[int, int]] = {}  # cluster -> (n_tokens, doc_id)
    for r in cl.itertuples(index=False):
        cand = (ntok[int(r.doc_id)], int(r.doc_id))
        cur = best.get(int(r.cluster_id))
        if cur is None or cand[0] > cur[0] or (cand[0] == cur[0] and cand[1] < cur[1]):
            best[int(r.cluster_id)] = cand
    rows = [
        (int(r.doc_id), int(r.cluster_id), int(r.cluster_size),
         ntok[int(r.doc_id)], int(r.doc_id) == best[int(r.cluster_id)][1])
        for r in cl.itertuples(index=False)
    ]
    return pd.DataFrame(
        rows, columns=["doc_id", "cluster_id", "cluster_size", "n_tokens", "keep"]
    ).astype({"doc_id": "int64", "cluster_id": "int64", "cluster_size": "int64",
              "n_tokens": "int64", "keep": "bool"})


BUILDERS["near_dup_keep_best"] = build_keep_best


if __name__ == "__main__":
    import sys

    ensure_fixtures(force="--force" in sys.argv)
    for name in BUILDERS:
        import pyarrow.parquet as pq

        t = pq.read_table(fixture_path(name))
        print(f"{name}: {t.num_rows} rows, {t.schema.names}")


INC_BATCH_MOD = 5  # doc_id % 5 == 4 → "new batch" (~20% of the corpus)


def build_incremental_minhash() -> pd.DataFrame:
    """Mirror of queries.incremental_minhash_dedup: banded LSH buckets
    over ALL docs, but pairs drawn only batch×corpus from buckets holding
    both kinds within the cap; exact-Jaccard confirm (integer milli)."""
    docs = _read_sf001("documents")
    sh = {int(d): shingle_set(t) for d, t in zip(docs.doc_id, docs.text)}
    sigs = {d: _minhash_sig(ss) for d, ss in sh.items() if ss}
    buckets: dict[tuple[int, int], list[int]] = {}
    for d, m in sorted(sigs.items()):
        for b in range(MINHASH_BANDS):
            key = (b, xxhash64_str(f"{b}|{m[2 * b]}|{m[2 * b + 1]}"))
            buckets.setdefault(key, []).append(d)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) > MINHASH_BUCKET_CAP:
            continue
        batch = [d for d in members if d % INC_BATCH_MOD == INC_BATCH_MOD - 1]
        corpus = [d for d in members if d % INC_BATCH_MOD != INC_BATCH_MOD - 1]
        for a in batch:
            for b2 in corpus:
                pairs.add((a, b2))
    rows = []
    for a, b in sorted(pairs):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        rows.append((a, b, (1000 * inter) // union))
    return pd.DataFrame(
        rows, columns=["batch_doc", "corpus_doc", "jaccard_milli"]
    ).astype(
        {"batch_doc": "int64", "corpus_doc": "int64", "jaccard_milli": "int64"}
    )


BUILDERS["incremental_minhash_dedup"] = build_incremental_minhash


# --------------------------------------------------------------------------
# Image+caption corpus FILTER gate (the LAION-style pre-training pass) and
# generic-caption dedup.  laion_corpus plants deterministic negatives into
# the T2_MULTI image rows: generic captions shared across many images,
# too-short / overlong captions, too-small metadata dims, aspect-busting
# widths — so the filter and the caption-dedup view both have real
# negatives to catch.  Thresholds sit against the measured corpus base
# (24-32 x 16-22 px, bpp_milli 2095-3109, captions ~40 chars / 7 tokens).
# --------------------------------------------------------------------------

ICF_MIN_SIDE = 16          # min(w, h) >= — base corpus min is 16
ICF_MAX_ASPECT_MILLI = 3000  # 1000*max/min <= — base max is 2000
ICF_MIN_BPP_MILLI = 500    # payload-bytes sanity: 1000*n_bytes/(w*h) >=
ICF_CAP_MIN_TOKENS = 2
ICF_CAP_MIN_CHARS = 5
ICF_CAP_MAX_CHARS = 256
GENERIC_CAPTIONS = ["photo", "image", "IMG 4032", "untitled image"]
CAPTION_GENERIC_MIN_IMAGES = 3  # caption shared by >= N images => generic


def laion_corpus() -> pd.DataFrame:
    """(image_id, url, bytes, w, h, fmt, caption) with planted negatives,
    keyed off the url hash so the mutation set is stable under corpus
    regeneration.  hv % 11: 0 -> generic caption, 1 -> one-char caption,
    2 -> overlong caption, 3 -> too-small metadata dims, 4 -> aspect-busting
    width (also sinks bpp), 5 -> pHash near-dup plant (this row's phash is
    an earlier row's with one bit flipped — the recaptured/re-encoded image
    case for the pipeline's near-dup stage; nothing else reads phash so the
    filter/caption entries are untouched), else untouched."""
    from .testing.corpus import T2_MULTI, gen_corpus

    pdf = gen_corpus(T2_MULTI)["corpus"]
    pdf = pdf[pdf["bytes"].notna()][
        ["image_id", "url", "bytes", "w", "h", "fmt", "caption", "phash"]
    ].reset_index(drop=True)
    rows = []
    for r in pdf.to_dict("records"):
        hv = xxhash64_str(r["url"]) & 0x7FFFFFFFFFFFFFFF
        m = hv % 11
        if m == 0:
            r["caption"] = GENERIC_CAPTIONS[hv % len(GENERIC_CAPTIONS)]
        elif m == 1:
            r["caption"] = "x"
        elif m == 2:
            r["caption"] = r["caption"] + " pad" * 80
        elif m == 3:
            r["w"], r["h"] = 12, 9
        elif m == 4:
            r["w"] = r["w"] * 8
        elif m == 5 and rows:
            anchor = rows[hv % len(rows)]
            r["phash"] = int(anchor["phash"]) ^ (1 << (hv % 64))
        rows.append(r)
    return pd.DataFrame(rows)


def build_image_caption_filter() -> pd.DataFrame:
    """INDEPENDENT mirror of queries.image_caption_filter: pure-python
    integer math over the same planted corpus (the query side is one
    Catalyst scan stage — no UDF, no shuffle)."""
    out = []
    for r in laion_corpus().to_dict("records"):
        n_bytes = len(r["bytes"])
        w, h = int(r["w"]), int(r["h"])
        aspect_milli = (1000 * max(w, h)) // min(w, h)
        bpp_milli = (1000 * n_bytes) // (w * h)
        cap = r["caption"]
        cap_chars = len(cap)
        cap_tokens = len(tokens_of(cap))
        ok_size = min(w, h) >= ICF_MIN_SIDE
        ok_aspect = aspect_milli <= ICF_MAX_ASPECT_MILLI
        ok_payload = bpp_milli >= ICF_MIN_BPP_MILLI
        ok_caption = (
            cap_tokens >= ICF_CAP_MIN_TOKENS
            and ICF_CAP_MIN_CHARS <= cap_chars <= ICF_CAP_MAX_CHARS
        )
        out.append(
            (r["image_id"], w, h, n_bytes, aspect_milli, bpp_milli,
             cap_chars, cap_tokens, ok_size, ok_aspect, ok_payload,
             ok_caption,
             ok_size and ok_aspect and ok_payload and ok_caption)
        )
    return pd.DataFrame(
        out,
        columns=["image_id", "w", "h", "n_bytes", "aspect_milli",
                 "bpp_milli", "cap_chars", "cap_tokens", "ok_size",
                 "ok_aspect", "ok_payload", "ok_caption", "keep"],
    ).astype({
        "image_id": "object", "w": "int64", "h": "int64",
        "n_bytes": "int64", "aspect_milli": "int64", "bpp_milli": "int64",
        "cap_chars": "int64", "cap_tokens": "int64", "ok_size": "bool",
        "ok_aspect": "bool", "ok_payload": "bool", "ok_caption": "bool",
        "keep": "bool",
    })


BUILDERS["image_caption_filter"] = build_image_caption_filter


def build_caption_dedup_generic() -> pd.DataFrame:
    """INDEPENDENT mirror of queries.caption_dedup_generic: pandas groupby
    over the planted corpus.  A caption shared by >= CAPTION_GENERIC_MIN_
    IMAGES distinct images is 'generic' ("photo", "untitled", ...); the
    dedup keeps ONE representative per generic caption (min image_id) and
    every image with a specific caption."""
    pdf = laion_corpus()[["image_id", "caption"]]
    g = pdf.groupby("caption")["image_id"].agg(["nunique", "min"])
    out = []
    for r in pdf.to_dict("records"):
        n = int(g.loc[r["caption"], "nunique"])
        generic = n >= CAPTION_GENERIC_MIN_IMAGES
        keep = (not generic) or r["image_id"] == g.loc[r["caption"], "min"]
        out.append((r["image_id"], n, generic, keep))
    return pd.DataFrame(
        out, columns=["image_id", "caption_images", "is_generic", "keep"]
    ).astype({
        "image_id": "object", "caption_images": "int64",
        "is_generic": "bool", "keep": "bool",
    })


BUILDERS["caption_dedup_generic"] = build_caption_dedup_generic


# --------------------------------------------------------------------------
# PII redaction — the scrubbing pass a training-data pipeline runs before
# export.  Patterns use EXPLICIT ASCII classes only (no \s, no \d shorthand
# divergence risk) so Spark's Java regex and the mirror's Python re agree;
# both engines replace all non-overlapping leftmost matches.  Emails are
# redacted first, then IPv4, then phones (the patterns are mutually
# non-overlapping on any input by construction: only emails contain '@',
# only phones start '+', the IP pattern requires digit-only dotted quads).
# --------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3,4}[ -][0-9]{2,4}"


def pii_corpus() -> pd.DataFrame:
    """sf0.01 documents with PII planted deterministically by doc_id class:
    %7==0 gets an email, %7==1 an IPv4, %7==2 a phone, %7==3 all three,
    the rest stay clean (the redactor must pass clean text through
    byte-identical)."""
    docs = _read_sf001("documents")[["doc_id", "text"]]
    rows = []
    for d, t in zip(docs.doc_id, docs.text):
        d = int(d)
        m = d % 7
        planted = t
        if m in (0, 3):
            planted += f" contact user{d}@mail-{d % 13}.example.com now"
        if m in (1, 3):
            planted += f" served from 10.{d % 256}.{(d * 7) % 256}.{d % 100}"
        if m in (2, 3):
            planted += f" call +{1 + d % 89} {200 + d % 700}-{1000 + d % 9000}-{10 + d % 90}"
        rows.append((d, planted))
    return pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64", "text": "object"}
    )


def build_pii_redact() -> pd.DataFrame:
    """INDEPENDENT mirror of queries.pii_redact: Python re over the same
    planted corpus (the query side is JVM regexp_count/regexp_replace —
    the entry certifies the two regex engines agree on these patterns)."""
    out = []
    for r in pii_corpus().to_dict("records"):
        t = r["text"]
        n_emails = len(re.findall(PII_EMAIL_RE, t))
        clean = re.sub(PII_EMAIL_RE, "<EMAIL>", t)
        n_ips = len(re.findall(PII_IPV4_RE, clean))
        clean = re.sub(PII_IPV4_RE, "<IP>", clean)
        n_phones = len(re.findall(PII_PHONE_RE, clean))
        clean = re.sub(PII_PHONE_RE, "<PHONE>", clean)
        out.append((r["doc_id"], n_emails, n_ips, n_phones, clean))
    return pd.DataFrame(
        out, columns=["doc_id", "n_emails", "n_ips", "n_phones", "text_clean"]
    ).astype({
        "doc_id": "int64", "n_emails": "int64", "n_ips": "int64",
        "n_phones": "int64", "text_clean": "object",
    })


BUILDERS["pii_redact"] = build_pii_redact


def build_image_training_pipeline() -> pd.DataFrame:
    """INDEPENDENT mirror of queries.image_training_pipeline — the composed
    image-corpus curation: LAION-style filter -> generic-caption dedup
    (among filter survivors) -> pHash near-dup keep-one (among survivors of
    both, brute-force popcount + union-find, min-id canonical).  Stage
    flags are False for rows dropped upstream (the stage never sees them)."""
    corpus = laion_corpus()
    fkeep = dict(zip(
        build_image_caption_filter().image_id,
        build_image_caption_filter().keep,
    ))
    s1 = [r for r in corpus.to_dict("records") if fkeep[r["image_id"]]]

    by_cap: dict[str, list[str]] = {}
    for r in s1:
        by_cap.setdefault(r["caption"], []).append(r["image_id"])
    ckeep = {}
    for cap, ids in by_cap.items():
        generic = len(set(ids)) >= CAPTION_GENERIC_MIN_IMAGES
        rep = min(ids)
        for i in ids:
            ckeep[i] = (not generic) or i == rep
    s2 = [r for r in s1 if ckeep[r["image_id"]]]

    ids = sorted(r["image_id"] for r in s2)
    ph = {r["image_id"]: int(r["phash"]) for r in s2}
    parent = {v: v for v in ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(ph[a] ^ ph[b]).count("1") <= PHASH_MAX_HAMMING:
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
    nkeep = {v: find(v) == v for v in ids}

    out = []
    for r in corpus.to_dict("records"):
        i = r["image_id"]
        pf = bool(fkeep[i])
        pc = bool(pf and ckeep.get(i, False))
        pn = bool(pc and nkeep.get(i, False))
        out.append((i, pf, pc, pn, pf and pc and pn))
    return pd.DataFrame(
        out,
        columns=["image_id", "pass_filter", "pass_caption", "pass_neardup",
                 "keep"],
    ).astype({
        "image_id": "object", "pass_filter": "bool", "pass_caption": "bool",
        "pass_neardup": "bool", "keep": "bool",
    })


BUILDERS["image_training_pipeline"] = build_image_training_pipeline


def caption_consolidation_corpus() -> pd.DataFrame:
    """(image_id, url, bytes, caption): the laion corpus plus, for rows
    with hv%11==6, a byte-IDENTICAL re-crawl under a different URL whose
    caption differs — alternately richer (the re-crawl should win) or a
    bare generic (the original should win).  The consolidation op must
    keep exactly one caption per content group: most tokens, ties to the
    lowest image_id."""
    base = laion_corpus()[["image_id", "url", "bytes", "caption"]]
    extra = []
    for r in base.to_dict("records"):
        hv = xxhash64_str(r["url"]) & 0x7FFFFFFFFFFFFFFF
        if hv % 11 == 6:
            dup = dict(r)
            dup["image_id"] = r["image_id"] + "-re"
            dup["url"] = r["url"] + "?re=1"
            if (hv >> 4) % 2 == 0:
                dup["caption"] = r["caption"] + " with extra descriptive detail"
            else:
                dup["caption"] = "photo"
            extra.append(dup)
    return pd.concat([base, pd.DataFrame(extra)], ignore_index=True)


def build_image_caption_consolidate() -> pd.DataFrame:
    """INDEPENDENT mirror of queries.image_caption_consolidate: hashlib md5
    + pandas groupby (max tokens, ties to min image_id)."""
    import hashlib

    pdf = caption_consolidation_corpus()
    rows = []
    for r in pdf.to_dict("records"):
        rows.append((
            r["image_id"],
            hashlib.md5(bytes(r["bytes"])).hexdigest(),
            len(tokens_of(r["caption"])),
        ))
    tmp = pd.DataFrame(rows, columns=["image_id", "content_md5", "cap_tokens"])
    out = []
    for md5h, grp in tmp.groupby("content_md5"):
        best = int(grp.cap_tokens.max())
        keep_image = grp[grp.cap_tokens == best].image_id.min()
        for r in grp.to_dict("records"):
            out.append((
                r["image_id"], md5h, len(grp), r["cap_tokens"],
                r["image_id"] == keep_image,
            ))
    return pd.DataFrame(
        out,
        columns=["image_id", "content_md5", "n_copies", "cap_tokens", "keep"],
    ).astype({
        "image_id": "object", "content_md5": "object", "n_copies": "int64",
        "cap_tokens": "int64", "keep": "bool",
    })


BUILDERS["image_caption_consolidate"] = build_image_caption_consolidate


# Aspect-ratio bucketing (the SDXL-style training-batch grouping): every
# image is assigned the NEAREST target aspect from a small fixed table so
# batches can be formed from same-bucket images without destructive crops.
ASPECT_BUCKETS_MILLI = [500, 750, 1000, 1333, 1500, 2000]  # w/h * 1000


def build_image_aspect_buckets() -> pd.DataFrame:
    """INDEPENDENT mirror of queries.image_aspect_buckets: pure-python
    nearest-bucket (ties to the SMALLER target) + per-bucket counts."""
    pdf = laion_corpus()
    rows = []
    for r in pdf.to_dict("records"):
        w, h = int(r["w"]), int(r["h"])
        aspect = (1000 * w) // h
        bucket = min(
            ASPECT_BUCKETS_MILLI, key=lambda b: (abs(aspect - b), b)
        )
        rows.append((r["image_id"], w, h, aspect, bucket))
    tmp = pd.DataFrame(
        rows, columns=["image_id", "w", "h", "aspect_milli", "bucket_milli"]
    )
    sizes = tmp.groupby("bucket_milli").size().to_dict()
    tmp["bucket_images"] = tmp.bucket_milli.map(sizes)
    return tmp.astype({
        "image_id": "object", "w": "int64", "h": "int64",
        "aspect_milli": "int64", "bucket_milli": "int64",
        "bucket_images": "int64",
    })


BUILDERS["image_aspect_buckets"] = build_image_aspect_buckets
