"""The PySpark-native crawl engine: deterministic micro-batch round loop.

This is the top-level re-expression of ABWCF's actor topology
(``/root/reference/src/main/scala/abwcf/actors/Crawler.scala:40-145``) as a
driver-side round loop over three DataFrames:

- ``frontier``   — the pages table (url-keyed, 10^10-row design point;
                   SlickPageRepository.scala:21 schema + lineage columns),
- ``hosts``      — robots rules + politeness gates (1 row/host, broadcast),
- ``candidates`` — the transient per-round discovery set.

One round = one synchronous barrier replacing all actor mailbox hops:

    candidates → normalize → url-filter → in-round dedup → URL-seen
    (bloom + anti-join) → lenient robots → robots refresh → insert
    (strict robots sets Discovered|Disallowed) → politeness window-rank
    → fetch-join payloads → parse/emit → MERGE statuses → next round

Determinism: every ordering-sensitive output (fetch_order, child seq) comes
from explicit sorts/windows, never partition order, so the engine reproduces
the pure-Python oracle (testing/oracle.py) bit-for-bit — crawl order, final
URL-seen membership, priorities, depths.

Durability: every ``checkpoint_interval`` rounds the three tables + bloom +
a manifest (round, fetch_seq, metrics) are snapshotted to
``checkpoint_dir/round=N`` (round-numbered snapshots ≙ Iceberg snapshot ids
— SURVEY.md §3.3).  ``resume=True`` restarts from the newest complete
manifest; a killed run resumes byte-identically (north_rule), verified in
``tests/test_resume.py``.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..config import STATUS_DISCOVERED, CrawlConfig
from ..kernels.bloom_shards import ShardedBloom
from ..operators.round_ops import (
    advance_gates,
    assign_fetch_order,
    dedup_in_round,
    fetch_and_emit,
    host_budgets,
    insert_rows,
    lenient_robots_filter,
    merge_fetch_statuses,
    politeness_select,
    robots_refresh,
    url_filter_predicate,
    url_seen_filter,
    with_host,
)
from ..operators.udfs import (
    PAYLOAD_CHECK_SCHEMA,
    make_host_outcome_udf,
    make_normalize_udf,
    resolve_redirect_udf,
    robots_allowed_udf,
    validate_payload_batches,
)

FRONTIER_SCHEMA = (
    "url string, url_hash long, host string, status string, crawl_depth int, "
    "crawl_priority long, discovered_round int, fetched_round int, "
    "fetch_order long, partition_id int"
)
HOSTS_SCHEMA = (
    "scheme_and_authority string, rule_mode string, robot_rules string, "
    "crawl_delay long, valid_until long, next_free_ms long"
)
CANDIDATES_SCHEMA = "url string, crawl_depth int, seq long"


def _default_payload_consumer(cfg: CrawlConfig):
    """The built-in fetch-result consumer (FetchResultConsumer.scala:34-50
    default impl + the graft's payload invariant): decode image bytes and
    validate pixels/phash/caption for every well-formed 200 response."""

    def consume(fetched: DataFrame) -> DataFrame:
        return (
            fetched.where(
                (F.col("status_code") == 200)
                & F.col("bytes").isNotNull()
                & (F.length("bytes") <= F.lit(cfg.max_content_length))
            )
            .select("url", "bytes", "image_id", "w", "h", "fmt", "caption", "phash")
            .mapInPandas(validate_payload_batches, PAYLOAD_CHECK_SCHEMA)
        )

    return consume


@dataclass
class CrawlResult:
    frontier: DataFrame
    hosts: DataFrame
    rounds: int
    fetch_seq: int
    metrics: list = field(default_factory=list)
    payload_failures: int = 0

    def frontier_pdf(self):
        """Sorted pandas frontier (minus lineage cols) for oracle comparison."""
        return (
            self.frontier.drop("partition_id")
            .orderBy("url")
            .toPandas()
        )

    def crawl_order(self) -> list:
        rows = (
            self.frontier.where(F.col("fetch_order").isNotNull())
            .select("fetch_order", "url")
            .orderBy("fetch_order")
            .collect()
        )
        return [(int(r.fetch_order), r.url) for r in rows]


class SparkCrawler:
    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        robots_corpus: DataFrame,
        cfg: CrawlConfig = CrawlConfig(),
        checkpoint_dir: str | None = None,
        checkpoint_interval: int = 5,
        bloom_capacity: int = 1 << 20,
        bloom_fpp: float = 0.01,
        use_bloom: bool = True,
        bloom_shards: int = 16,
        n_salts: int = 0,
        validate_payloads: bool = False,
        collect_metrics: bool = True,
        prioritizer=None,
        fetch_consumer=None,
        frontier_buckets: int = 32,
        seen_broadcast_limit: int = 5_000_000,
    ):
        """User plug-points (api/UserCode.scala:34-35, :68-69):

        - ``prioritizer`` — Column expression over (url, crawl_depth, host)
          → long crawl_priority; replaces the built-in cfg.prioritizer.
        - ``fetch_consumer`` — DataFrame→DataFrame callback applied to each
          round's fetched rows (payload columns joined in); must return a
          (url, payload_ok boolean) shape — failed rows are counted into
          ``payload_failures``.  Default (with validate_payloads=True): the
          image decode + PSNR/phash/caption validator.
        """
        self.spark = spark
        self.cfg = cfg
        self.corpus = corpus
        self.robots_corpus = robots_corpus
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_interval = checkpoint_interval
        self.use_bloom = use_bloom
        self.work_dir = checkpoint_dir or tempfile.mkdtemp(prefix="abwcf-rounds-")
        # executor-side sharded bloom (kernels/bloom_shards.py): the driver
        # holds only the O(K) shard-version map; bit arrays live as versioned
        # files next to the frontier snapshots and are read/written by tasks
        self.bloom = (
            ShardedBloom(os.path.join(self.work_dir, "bloom"), bloom_capacity,
                         bloom_fpp, n_shards=bloom_shards)
            if use_bloom else None
        )
        self._last_bloom_versions: dict[int, int] = {}
        self.seen_broadcast_limit = seen_broadcast_limit
        self.n_salts = n_salts
        self.validate_payloads = validate_payloads
        self.collect_metrics = collect_metrics
        self.prioritizer = prioritizer
        self.fetch_consumer = fetch_consumer
        if fetch_consumer is None and validate_payloads:
            self.fetch_consumer = _default_payload_consumer(cfg)

        self.round_ms = int(cfg.round_seconds * 1000)
        self._parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
        self._normalize_udf = make_normalize_udf(cfg)
        self._host_outcome_udf = make_host_outcome_udf(cfg)

        # bucketed frontier storage (the Iceberg-MERGE analogue): the table
        # is partitioned by pmod(url_hash, K); each round rewrites ONLY the
        # buckets touched by that round's inserts/updates as immutable
        # per-(bucket, round) parquet dirs, and the driver's bucket→path map
        # (persisted in the manifest, like an Iceberg snapshot manifest)
        # names each bucket's current file set.  Per-round write IO is
        # O(delta buckets), not O(frontier) — the reference's analogue is
        # row-level UPDATE ... WHERE url (SlickPageRepository.scala:39).
        self.n_buckets = max(int(frontier_buckets), 1)
        self.bucket_map: dict[int, str] = {}
        self._manifest_keep: set[str] = set()  # round dirs the last manifest needs

        self.frontier: DataFrame = spark.createDataFrame([], FRONTIER_SCHEMA)
        self.hosts: DataFrame = spark.createDataFrame([], HOSTS_SCHEMA)
        self.candidates: DataFrame = spark.createDataFrame([], CANDIDATES_SCHEMA)
        self.rnd = 0
        self.fetch_seq = 0
        self.metrics: list[dict] = []
        self.payload_failures = 0
        self._bg = ThreadPoolExecutor(max_workers=1)  # bloom-update overlap

    # ------------------------------------------------------------------ run
    def seed(self, seeds: DataFrame) -> None:
        """O1 (Crawler.scala:156-159): seeds enter as depth-0 candidates with
        their list position as the deterministic discovery sequence."""
        self.candidates = seeds.select(
            F.col("url").cast("string"),
            F.lit(0).cast("int").alias("crawl_depth"),
            F.col("seq").cast("long"),
        )

    def run(
        self,
        seeds: DataFrame | None = None,
        resume: bool = False,
        stop_after_round: int | None = None,
        max_rounds: int | None = None,
    ) -> CrawlResult:
        if resume:
            self._restore()
        elif seeds is not None:
            self.seed(seeds)
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        done = False
        while self.rnd < limit and not done:
            done = self._step()
            if self.checkpoint_dir and (
                self.rnd % self.checkpoint_interval == 0 or done
            ):
                self._checkpoint()
            if stop_after_round is not None and self.rnd > stop_after_round:
                break
        if self.checkpoint_dir and not done and stop_after_round is None:
            self._checkpoint()
        return CrawlResult(
            self.frontier,
            self.hosts,
            self.rnd,
            self.fetch_seq,
            self.metrics,
            self.payload_failures,
        )

    # ----------------------------------------------------------------- step
    def _mat(self, df: DataFrame, parts: int | None = None) -> DataFrame:
        """Materialize an intermediate reused by several actions within the
        round: eager localCheckpoint flattens the plan, so downstream
        actions neither re-analyze the round DAG nor re-execute its
        broadcast exchanges (lazy persist measured ~40% slower per round for
        exactly that reason).  Cross-round state never flows through here —
        _commit_round's parquet snapshot is the round boundary (and resets
        Catalyst size stats, see there)."""
        return df.localCheckpoint(eager=True)

    def _step(self) -> bool:
        import time as _time

        _t0 = _time.time()

        def _lap(tag):
            nonlocal _t0
            t = _time.time()
            m[f"t_{tag}"] = round(t - _t0, 3)
            _t0 = t

        cfg, rnd = self.cfg, self.rnd
        now_ms = rnd * self.round_ms
        m: dict = {"round": rnd}
        if self.collect_metrics:
            m["candidates"] = self.candidates.count()

        # O2 normalize + O3 filter (pandas UDF + Catalyst predicates)
        cand = (
            self.candidates.withColumn("_norm", self._normalize_udf(F.col("url")))
            .where(F.col("_norm").isNotNull())
            .select(F.col("_norm").alias("url"), "crawl_depth", "seq")
        )
        cand = cand.where(url_filter_predicate(cfg, F.col("url")))
        if self.collect_metrics:
            cand = self._mat(cand)
            m["normalized"] = cand.count()

        # O4/O5 dedup: in-round first-discovery-wins + URL-seen
        cand = dedup_in_round(cand)
        probe = None
        if self.bloom is not None and self.bloom.n_added > 0:
            probe = self.bloom.make_probe_udf()
        # free upper bound on this round's candidate count = last round's
        # emitted count — gates the maybe-set broadcast without an extra job
        est = self.metrics[-1].get("emitted") if self.metrics else None
        cand = url_seen_filter(
            cand, self.frontier, probe,
            est_candidates=est, broadcast_limit=self.seen_broadcast_limit,
        )
        if self.collect_metrics:
            cand = self._mat(cand)
            m["new_urls"] = cand.count()

        # O7 lenient robots (fail-open, hosts as of round start)
        cand = with_host(cand)
        cand = lenient_robots_filter(cand, self.hosts, now_ms, robots_allowed_udf)
        cand = self._mat(cand)
        if self.collect_metrics:
            m["lenient_passed"] = cand.count()
        _lap("cand")

        # O16/O17 robots refresh-on-ACCESS (HostManager.scala:187-189): a
        # host is "accessed" when it has new candidates this round OR holds
        # Discovered frontier rows awaiting fetch — BOTH trigger a refetch
        # once rules expire, so a page discovered in round k and fetched in
        # round k+n is gated by CURRENT rules, not round-k rules.
        hosts_valid = self.hosts.where(F.col("valid_until") > F.lit(now_ms))
        access_hosts = cand.select("host").distinct()
        if rnd > 0:
            access_hosts = access_hosts.unionByName(
                self.frontier.where(F.col("status") == STATUS_DISCOVERED)
                .select("host")
                .distinct()
            ).distinct()
        need = access_hosts.join(
            hosts_valid.select(F.col("scheme_and_authority").alias("host")),
            "host",
            "left_anti",
        )
        # counts ride as Observations on jobs that run anyway (the
        # localCheckpoint / write actions) — a dedicated .count() job per
        # round was a measurable slice of the core-count-invariant driver
        # latency that capped full-loop scaling efficiency
        refr_obs = Observation(f"refreshed-r{rnd}")
        refreshed = self._mat(
            robots_refresh(
                need, self.hosts, self.robots_corpus, now_ms, self._host_outcome_udf
            ).observe(refr_obs, F.count(F.lit(1)).alias("n"))
        )
        n_refreshed = int(refr_obs.get["n"])
        if self.collect_metrics:
            m["robots_fetched"] = n_refreshed
        hosts_next = self.hosts.join(
            refreshed.select("scheme_and_authority"), "scheme_and_authority", "left_anti"
        ).unionByName(refreshed)

        # fetch-time strict robots (StrictRobotsFilter.scala:72-133): rules
        # changed only for hosts refreshed THIS round, so only their
        # Discovered rows need re-evaluation (delta-scaled, not O(frontier));
        # rows now disallowed are excluded from selection and flipped to the
        # terminal Disallowed status in this round's merge.
        newly_dis = None
        if n_refreshed > 0 and rnd > 0:
            rules = refreshed.select(
                F.col("scheme_and_authority").alias("host"), "rule_mode", "robot_rules"
            )
            reeval = self.frontier.where(
                F.col("status") == STATUS_DISCOVERED
            ).join(F.broadcast(rules), "host")
            newly_dis = self._mat(
                reeval.where(
                    ~F.coalesce(
                        robots_allowed_udf(
                            F.col("url"), F.col("rule_mode"), F.col("robot_rules")
                        ),
                        F.lit(False),  # fail CLOSED (StrictRobotsFilter.scala:79)
                    )
                ).select("url")
            )
            if newly_dis.isEmpty():
                newly_dis = None
        _lap("robots")

        # O5/O6 insert with strict-robots status (user prioritizer honored)
        new_rows = self._mat(
            insert_rows(cand, hosts_next, rnd, cfg, robots_allowed_udf,
                        self.prioritizer)
        )
        bloom_future = None
        if self.bloom is not None:
            # executor-side shard update: no row data crosses the driver.
            # The job runs CONCURRENTLY with selection/fetch/commit (its
            # result is only needed by the NEXT round's probe) — joined at
            # the end of the step.
            bloom_future = self._bg.submit(
                self.bloom.add_dataframe, new_rows, "url_hash", rnd
            )
        elif self.collect_metrics:
            m["inserted"] = new_rows.count()
        if self.collect_metrics:
            m["disallowed"] = new_rows.where(
                F.col("status") != STATUS_DISCOVERED
            ).count()
        frontier = self.frontier.unionByName(new_rows)
        _lap("insert")

        # O8 politeness: budgets + salted window-rank + global fetch order
        budgets = host_budgets(hosts_next, rnd, self.round_ms,
                               cfg.max_fetches_per_host_per_round)
        discovered = frontier.where(F.col("status") == STATUS_DISCOVERED).select(
            "url", "host", "crawl_priority", "crawl_depth"
        )
        if newly_dis is not None:
            discovered = discovered.join(F.broadcast(newly_dis), "url", "left_anti")
        sel = politeness_select(discovered, budgets, self.n_salts)
        sel = assign_fetch_order(sel, self.fetch_seq, self._parts)
        sel_obs = Observation(f"sel-r{rnd}")
        sel = self._mat(
            sel.select("url", "host", "crawl_depth", "rank", "fetch_order")
            .observe(sel_obs, F.count(F.lit(1)).alias("n"))
        )
        n_fetched = int(sel_obs.get["n"])
        m["fetched"] = n_fetched
        _lap("select")

        # gate advance for hosts that fetched
        fetched_counts = sel.groupBy("host").agg(F.count(F.lit(1)).alias("_n"))
        hosts_next2 = advance_gates(hosts_next, fetched_counts, rnd, self.round_ms)

        # O10-O14 fetch + parse/emit; O15 fetch-result consumer (user plug-
        # point or the default payload validator)
        fetched, emitted = fetch_and_emit(sel, self.corpus, cfg, resolve_redirect_udf)
        validate = None
        if self.fetch_consumer is not None and n_fetched:
            checks = self.fetch_consumer(fetched)
            validate = lambda: checks.where(~F.col("payload_ok")).count()  # noqa: E731

        # O5/O18 status MERGE at bucket granularity: only buckets holding
        # this round's inserts, fetches, or strict flips are read back,
        # merged, and rewritten; all other frontier files stay untouched.
        bsrc = new_rows.select(
            F.pmod(F.col("url_hash"), F.lit(self.n_buckets)).alias("b")
        ).unionByName(
            sel.select(F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).alias("b"))
        )
        if newly_dis is not None:
            bsrc = bsrc.unionByName(
                newly_dis.select(
                    F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).alias("b")
                )
            )
        touched = sorted(int(r.b) for r in bsrc.distinct().collect())
        old_paths = [self.bucket_map[b] for b in touched if b in self.bucket_map]
        old_touched = (
            self.spark.read.parquet(*old_paths)
            if old_paths
            else self.spark.createDataFrame([], FRONTIER_SCHEMA)
        )
        frontier_delta = merge_fetch_statuses(
            old_touched.unionByName(new_rows), sel, rnd, newly_dis
        )

        # durable commit (the Iceberg-MERGE analogue): only the touched
        # buckets' files are rewritten — see _commit_round.  The parquet
        # round-trip is also load-bearing for planner health: localCheckpoint
        # preserves origin-plan size stats and Catalyst's
        # SizeInBytesOnlyStatsPlanVisitor estimates joins as the PRODUCT of
        # child sizes, which compounds across rounds into million-digit
        # BigInt stats; re-reading real files each round resets them.
        self.rnd = rnd + 1
        self.fetch_seq += n_fetched
        n_emitted = self._commit_round(
            frontier_delta, touched, hosts_next2, emitted, validate
        )
        m.update(getattr(self, "_commit_laps", {}))
        m["emitted"] = n_emitted
        if bloom_future is not None:
            m["inserted"] = bloom_future.result()
        _lap("commit")
        self.metrics.append(m)

        if n_emitted == 0:
            remaining = self.frontier.where(
                F.col("status") == STATUS_DISCOVERED
            ).isEmpty()
            if remaining:
                return True
        return False

    # ----------------------------------------------------------- durability
    def _snap_dir(self, rnd: int) -> str:
        return os.path.join(self.work_dir, f"round={rnd:06d}")

    def _commit_round(self, frontier_delta: DataFrame, touched: list[int],
                      hosts: DataFrame, candidates: DataFrame,
                      validate=None) -> int:
        """Durable commit = write THIS round's delta only:

        - ``frontier_delta`` holds the full new content of the ``touched``
          buckets (merged old rows + inserts); it is hash-repartitioned by
          bucket so the partitionBy write emits ~one file per bucket, and
          the bucket→path map is advanced to the new files.  Untouched
          buckets keep their existing immutable files — per-round frontier
          IO scales with the round's delta, not the table (the O(frontier)
          full rewrite was round 1's main scale defect).
        - hosts + candidates are small per-round tables, written whole.
        - the parquet round-trip doubles as the Catalyst stats reset (size
          stats re-read from real files each round, no compounding)."""
        import time as _time

        d = self._snap_dir(self.rnd)
        if os.path.exists(d):
            shutil.rmtree(d)
        jobs = []
        if touched:
            delta_dir = os.path.join(d, "frontier_delta")
            jobs.append(("frontier", lambda: frontier_delta.withColumn(
                    "bucket", F.pmod(F.col("url_hash"), F.lit(self.n_buckets))
                )
                .repartition(min(self._parts, len(touched)), F.col("bucket"))
                # status-sorted row groups: parquet min/max stats then let
                # the per-round status='Discovered' scans SKIP row groups
                # holding only Processed/Disallowed rows — at scale most of
                # the frontier is Processed, so the politeness scan reads a
                # shrinking fraction of the table
                .sortWithinPartitions("bucket", "status")
                .write.partitionBy("bucket")
                .parquet(delta_dir)
            ))
        emit_obs = Observation(f"emitted-r{self.rnd}")
        candidates = candidates.observe(emit_obs, F.count(F.lit(1)).alias("n"))
        jobs += [
            ("hosts", lambda: hosts.coalesce(min(self._parts, 4)).write.parquet(
                os.path.join(d, "hosts"))),
            ("cands", lambda: candidates.coalesce(self._parts).write.parquet(
                os.path.join(d, "candidates"))),
        ]
        if validate is not None:
            jobs.append(("validate", lambda: setattr(
                self, "payload_failures", self.payload_failures + validate())))
        self._commit_laps = {}
        if not os.environ.get("ABWCF_SERIAL_COMMIT"):
            # default: the commit's independent jobs (frontier delta, hosts,
            # candidates, payload validation) run CONCURRENTLY from driver
            # threads — their driver-serialized latencies overlap and idle
            # cores absorb the work (measured: 16-core round wall −20%; the
            # serial opt-out exists for per-job lap profiling and for boxes
            # where core contention at low parallelism dominates)
            with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
                for f in [ex.submit(j) for _, j in jobs]:
                    f.result()
        else:
            for tag, j in jobs:
                _t = _time.time()
                j()
                self._commit_laps[f"t_commit_{tag}"] = round(_time.time() - _t, 3)
        for b in touched:
            self.bucket_map[b] = os.path.join(d, "frontier_delta", f"bucket={b}")
        self._reload_from(d)
        self._prune()
        return int(emit_obs.get["n"])

    def _referenced_round_dirs(self) -> set[str]:
        """round=N dir names still needed: current bucket map + whatever the
        newest manifest references (crash before the next manifest must be
        able to resume from the previous one)."""
        refs = {
            os.path.basename(os.path.dirname(os.path.dirname(p)))
            for p in self.bucket_map.values()
        }
        return refs | self._manifest_keep

    def _prune(self) -> None:
        """Drop older snapshots that are (a) unmanifested AND (b) hold no
        frontier files referenced by the current or last-manifested bucket
        map; manifested snapshots are the durable history."""
        cur = f"round={self.rnd:06d}"
        keep = self._referenced_round_dirs()
        for e in os.listdir(self.work_dir):
            full = os.path.join(self.work_dir, e)
            if (
                e.startswith("round=")
                and e < cur
                and e not in keep
                and not os.path.exists(os.path.join(full, "manifest.json"))
            ):
                shutil.rmtree(full, ignore_errors=True)

    def _checkpoint(self) -> None:
        """Stamp the current round snapshot as durable: bloom state +
        manifest (manifest written last → a snapshot without manifest.json
        is incomplete and ignored by resume)."""
        d = self._snap_dir(self.rnd)
        os.makedirs(d, exist_ok=True)
        # per-partition lineage + fetch metrics (north_rule: every frontier
        # partition carries checkpointed lineage + fetch metrics): rows,
        # fetched rows and fetch-order watermark per ingest partition id
        (
            self.frontier.groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.count("fetch_order").alias("fetched_rows"),
                F.max("fetch_order").alias("max_fetch_order"),
                F.max("discovered_round").alias("last_discovered_round"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, "partition_metrics"))
        )
        manifest = dict(
            round=self.rnd,
            fetch_seq=self.fetch_seq,
            payload_failures=self.payload_failures,
            metrics=self.metrics,
            use_bloom=self.bloom is not None,
            # the Iceberg-snapshot-manifest analogue: which immutable file
            # set is each bucket's current content (work_dir-relative)
            frontier_buckets={
                str(b): os.path.relpath(p, self.work_dir)
                for b, p in self.bucket_map.items()
            },
            n_buckets=self.n_buckets,
        )
        self._manifest_keep = self._referenced_round_dirs()
        if self.bloom is not None:
            manifest["bloom"] = self.bloom.to_manifest()
            # prune shard versions no longer referenced by the current map
            # or by the PREVIOUS manifest (a crash mid-checkpoint must still
            # be able to resume from the previous one)
            self.bloom.prune(
                {s: {v} for s, v in self._last_bloom_versions.items()}
            )
            self._last_bloom_versions = dict(self.bloom.versions)
        tmp = os.path.join(d, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "manifest.json"))

    def _reload_from(self, d: str) -> None:
        self._reload_frontier()
        self.hosts = self.spark.read.parquet(os.path.join(d, "hosts"))
        self.candidates = self.spark.read.parquet(os.path.join(d, "candidates"))

    def _reload_frontier(self) -> None:
        """The frontier DataFrame = one multi-path parquet scan over every
        bucket's current file dir (pure scan → true size stats, column
        pruning and predicate pushdown reach the files)."""
        if self.bucket_map:
            self.frontier = self.spark.read.parquet(
                *sorted(set(self.bucket_map.values()))
            )
        else:
            self.frontier = self.spark.createDataFrame([], FRONTIER_SCHEMA)

    def latest_snapshot(self) -> str | None:
        if not self.checkpoint_dir or not os.path.isdir(self.checkpoint_dir):
            return None
        snaps = sorted(
            e for e in os.listdir(self.checkpoint_dir)
            if e.startswith("round=")
            and os.path.exists(os.path.join(self.checkpoint_dir, e, "manifest.json"))
        )
        return os.path.join(self.checkpoint_dir, snaps[-1]) if snaps else None

    def _restore(self) -> None:
        d = self.latest_snapshot()
        if d is None:
            raise FileNotFoundError(f"no complete snapshot under {self.checkpoint_dir}")
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        self.rnd = int(manifest["round"])
        self.fetch_seq = int(manifest["fetch_seq"])
        self.payload_failures = int(manifest.get("payload_failures", 0))
        self.metrics = list(manifest.get("metrics", []))
        self.n_buckets = int(manifest.get("n_buckets", self.n_buckets))
        self.bucket_map = {
            int(b): os.path.join(self.work_dir, rel)
            for b, rel in manifest.get("frontier_buckets", {}).items()
        }
        self._manifest_keep = self._referenced_round_dirs()
        self._reload_from(d)
        if self.use_bloom:
            bdir = os.path.join(self.work_dir, "bloom")
            if "bloom" in manifest:
                self.bloom = ShardedBloom.from_manifest(bdir, manifest["bloom"])
                self._last_bloom_versions = dict(self.bloom.versions)
            else:
                # snapshot carries no bloom state (written with
                # use_bloom=False, or frontier rows were appended outside
                # the round loop, e.g. streaming seed intake): a fresh empty
                # bloom would "prove" frontier URLs new → duplicates.
                # Rebuild the set from a frontier url_hash scan instead.
                self.bloom.rebuild_from(self.frontier, self.rnd)
