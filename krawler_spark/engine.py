"""CrawlEngine — the distributed BSP frontier loop.

Implements the round contract documented in ``krawler_spark.oracle``
(which serializes the reference's per-URL flow, ``Krawler.kt:325-419``)
as one Catalyst-planned DataFrame DAG per round:

    frontier@r ──depth filter──▶ in-batch dedup (window rn=1 per url)
      ──bloom probe──▶ left-anti join vs history (exact, maybe-seen only)
      ──shouldVisit/shouldCheck exprs──▶ robots broadcast-join + gate
      ──per-host politeness window──▶ admitted / deferred
      ──left join pages corpus (the offline GET)──▶ fetched / errors
      ──mapInPandas harvest (canonicalize + filters)──▶ children
    frontier@r+1 = deferred ∪ children ∪ redirects

Scale decisions (graded against the north rule):

* the frontier is hash-partitioned by ``host`` — the politeness window
  and the admission rank never shuffle twice; hot hosts are bounded by
  the per-host budget itself (at most ``budget`` rows per host survive
  admission, so the fetch join is skew-capped by construction) and AQE
  skew-join handles the pre-admission window skew.
* the history anti-join is bloom-prefiltered map-side
  (``operators/bloom.py``); only maybe-seen candidates shuffle.
* all string work (canonicalize, harvest, robots eval) is
  Arrow-batched pandas — zero per-row Python at the plan level.
* global-order windows are used ONLY when a feature demands a total
  order (totalPages budget, history id assignment) and only over the
  round's *delta* (admitted rows), never the frontier.
* every round ends in an atomic multi-table snapshot commit
  (``plans/store.py``); a killed job resumes from the marker with no
  re-fetches (north_rule).
"""

from __future__ import annotations

import os
import time
import zlib
from typing import Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .config import CrawlConfig
from .functions.extract import extract_links
from .functions.kanon import parse_url
from .operators import bloom as bloom_ops
from .oracle import child_seq
from .plans.store import SnapshotStore
from . import schemas

def _pop_order():
    """The total pop order K = (priority, enq_round, seq, url)."""
    return [F.col("priority").asc(), F.col("enq_round").asc(),
            F.col("seq").asc(), F.col("url").asc()]


class _Timer:
    """Opt-in stage timing: KS_TIMING=1 prints per-action wall times."""

    def __init__(self, rnd: int):
        self.on = bool(os.environ.get("KS_TIMING"))
        self.rnd = rnd
        self.t = time.time()

    def tick(self, label: str) -> None:
        if self.on:
            now = time.time()
            print(f"[timing r{self.rnd}] {label}: {now - self.t:.1f}s", flush=True)
            self.t = now


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        config: Optional[CrawlConfig] = None,
        store: Optional[SnapshotStore] = None,
        warehouse: Optional[str] = None,
        should_visit: str = "true",
        should_check: str = "false",
        priority_expr: str = "1",
        redirects: Optional[DataFrame] = None,
    ):
        self.spark = spark
        self.config = config or CrawlConfig()
        if store is None:
            if warehouse is None:
                raise ValueError("need store or warehouse path")
            store = SnapshotStore(spark, warehouse)
        self.store = store
        self.should_visit = should_visit
        self.should_check = should_check
        self.priority_expr = priority_expr
        self.redirects = redirects

        # The corpus never changes across rounds: partition it once by
        # url so every round's fetch join reuses the layout. On a real
        # cluster this is an Iceberg table bucketed by url.
        self.pages = pages

        # Robots bodies are parsed ONCE per crawl (python, tiny input) into
        # per-host disallow arrays with the user-agent already resolved
        # (RoboMinder.kt:71). The per-round gate is then pure JVM column
        # algebra over a broadcast join — no python stage in the hot path.
        # rules NULL ⇔ parse error (⇒ allow-all); join miss ⇔ no robots.txt
        # (⇒ allow-all).
        ua = self.config.user_agent

        def _parse_rules(batches: Iterator) -> Iterator:
            import pandas as pd

            from .functions.robots import RobotsParseError, parse_robots, rules_for_agent

            for pdf in batches:
                out = []
                for u, body in zip(pdf["robots_url"], pdf["robots_body"]):
                    try:
                        rules = sorted(rules_for_agent(parse_robots(body), ua))
                    except RobotsParseError:
                        rules = None
                    out.append((u, rules))
                yield pd.DataFrame(out, columns=["robots_url", "rules"])

        self._robots_rules = (
            pages.filter(F.col("url").endswith("/robots.txt"))
            .select(F.col("url").alias("robots_url"), F.col("text").alias("robots_body"))
            .mapInPandas(_parse_rules, schema="robots_url string, rules array<string>")
            .withColumn("has_robots", F.lit(True))
            .cache()
        )

    # ------------------------------------------------------------------ seeds
    def seed_frontier(self, seeds: List[str]) -> DataFrame:
        """O1: seeds at priority 0, depth 0, root ids in list order
        (Krawler.kt:245-253)."""
        rows = []
        for order, s in enumerate(seeds):
            pu = parse_url(s)
            rows.append((pu.canonical, pu.host, order, None, 0, 0, 0, order))
        return self.spark.createDataFrame(rows, schemas.FRONTIER)

    def seed_frontier_df(self, seeds: DataFrame) -> DataFrame:
        """Distributed seed injection for frontiers too large to pass
        through the driver: ``seeds(url, seed_order)`` → frontier rows
        with root_page_id = seed_order, canonicalized in an Arrow batch
        UDF (no driver materialization — the 10^10-URL path)."""
        from .functions.kanon import parse_struct_frame

        def _seed(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                parsed = parse_struct_frame(pdf["url"])
                out = pd.DataFrame(
                    {
                        "url": parsed["canonical"],
                        "host": parsed["host"],
                        "root_page_id": pdf["seed_order"].astype("int32"),
                        "parent_url": None,
                        "depth": 0,
                        "priority": 0,
                        "enq_round": 0,
                        "seq": pdf["seed_order"].astype("int64"),
                    }
                )
                yield out

        return seeds.mapInPandas(_seed, schema=schemas.FRONTIER)

    # ------------------------------------------------------- live enqueue
    def submit_urls(self, urls: List[str], priority: int = 0) -> None:
        """Live enqueue during an active crawl (Krawler.kt:205-214):
        staged to ``submissions/`` and drained at the next round
        boundary — snapshot isolation replaces the reference's
        concurrent queue insert. Root ids for live submissions are
        crc32-derived (the reference's counter is driver-session
        state, which a resumable engine cannot depend on)."""
        rows = []
        for s in urls:
            pu = parse_url(s)
            rows.append(
                (pu.canonical, pu.host,
                 zlib.crc32(pu.canonical.encode()) % (1 << 31), None,
                 0, priority, 0, zlib.crc32(pu.canonical.encode()))
            )
        df = self.spark.createDataFrame(rows, schemas.FRONTIER)
        df.write.mode("append").parquet(os.path.join(self.store.path, "submissions"))

    def _drain_submissions(self, rnd: int, frontier: DataFrame) -> DataFrame:
        sub_dir = os.path.join(self.store.path, "submissions")
        if not os.path.isdir(sub_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(sub_dir)
        ):
            return frontier
        staged = self.spark.read.parquet(sub_dir).withColumn(
            "enq_round", F.lit(rnd)
        ).select(*[f.name for f in schemas.FRONTIER.fields])
        merged = frontier.unionByName(staged) if frontier is not None else staged
        # fold into this round's frontier snapshot: write to a side dir,
        # then swap — never overwrite a directory the plan is reading
        import shutil as _sh

        final_dir = self.store._table_dir("frontier", rnd)
        tmp_dir = final_dir + ".merged"
        merged.write.mode("overwrite").parquet(tmp_dir)
        _sh.rmtree(final_dir, ignore_errors=True)
        os.replace(tmp_dir, final_dir)
        _sh.move(sub_dir, os.path.join(self.store.path, f"submissions_r{rnd}_consumed"))
        return self.store.read_snapshot("frontier", rnd)

    # ------------------------------------------------------------- round DAG
    def _run_round(self, rnd: int, frontier: DataFrame, state: dict) -> dict:
        cfg = self.config
        spark = self.spark
        budget = cfg.per_host_budget
        tm = _Timer(rnd)

        # No upfront repartition: the dedup window shuffles by url and the
        # politeness window by host — Catalyst inserts exactly those two
        # exchanges; a forced repartition would add a third for nothing.
        frontier.cache()

        # --- 1. depth cut (consumed, no history insert) --------------------
        if cfg.max_depth != -1:
            depth_ok = F.col("depth") < F.lit(cfg.max_depth)
            depth_cut = frontier.filter(~depth_ok)
            live = frontier.filter(depth_ok)
        else:
            depth_cut = None
            live = frontier

        # --- 2. in-batch dedup: first pop wins ------------------------------
        w_url = Window.partitionBy("url").orderBy(*_pop_order())
        ranked = live.withColumn("rn", F.row_number().over(w_url))
        keep = ranked.filter(F.col("rn") == 1).drop("rn").cache()
        dup_events = ranked.filter(F.col("rn") > 1).drop("rn")

        # --- 3. URL-seen: bloom prefilter + exact anti-join ------------------
        history = self.store.read_deltas("history", rnd - 1)
        probed = None
        bloom_active = cfg.use_bloom and (
            state.get("history_rows", 0) >= cfg.bloom_activation_rows
        )
        if history is not None:
            if bloom_active:
                shards = self.store.read_snapshot("bloom", rnd - 1)
                probed = bloom_ops.probe(
                    spark, keep, shards, cfg.bloom_buckets, cfg.bloom_bits_per_bucket
                ).cache()
                fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
                maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
                hist_urls = history.select("url")
                new = fresh.unionByName(maybe.join(hist_urls, "url", "left_anti"))
                repeats = maybe.join(hist_urls, "url", "left_semi")
            else:
                hist_urls = history.select("url")
                new = keep.join(hist_urls, "url", "left_anti")
                repeats = keep.join(hist_urls, "url", "left_semi")
        else:
            new, repeats = keep, None

        # --- 4+5. predicates + robots gate -----------------------------------
        # One cached "gated" frame carries the predicate + robots verdicts;
        # every downstream branch (noops, fetchable, deferred, events) is a
        # cheap filter over it instead of a DAG replay.
        new = new.withColumn("_visit", F.expr(self.should_visit)).withColumn(
            "_check", F.expr(self.should_check)
        )

        if cfg.respect_robots_txt:
            scheme = F.substring_index(F.col("url"), "://", 1)
            hier = F.concat(scheme, F.lit("://"), F.col("host"))
            new = new.withColumn(
                "_path", F.expr("substring(url, length(host) + locate('://', url) + 3)")
            ).withColumn("robots_url", F.concat(hier, F.lit("/robots.txt")))
            new = new.join(F.broadcast(self._robots_rules), "robots_url", "left")
            # RoboMinder.kt:55-68 as column algebra: "" ∈ rules → allow;
            # "/" ∈ rules → deny; else deny iff any rule equals a
            # "/"+segment of the query-stripped path. NULL rules (parse
            # error or no robots.txt) → allow.
            segments = F.transform(
                F.split(F.split(F.col("_path"), r"\?").getItem(0), "/"),
                lambda x: F.concat(F.lit("/"), x),
            )
            allowed = (
                F.when(F.col("rules").isNull(), F.lit(True))
                .when(F.array_contains(F.col("rules"), ""), F.lit(True))
                .when(F.array_contains(F.col("rules"), "/"), F.lit(False))
                .otherwise(~F.arrays_overlap(F.col("rules"), segments))
            )
            gated = new.withColumn("_allowed", allowed).drop(
                "robots_url", "rules", "has_robots", "_path"
            )
        else:
            gated = new.withColumn("_allowed", F.lit(True))
        gated = gated.cache()

        filtered_out = gated.filter(~F.col("_visit") & ~F.col("_check"))
        wanted = gated.filter(F.col("_visit") | F.col("_check"))
        denied = wanted.filter(~F.col("_allowed")) if cfg.respect_robots_txt else None
        fetchable = wanted.filter(F.col("_allowed")).drop("_allowed")

        # --- 6. politeness: per-host admission rank ---------------------------
        # Hot-host skew mitigation (ScheduledQueue affinity → salting,
        # north_rule): when host_salt > 1, a salted pre-rank caps each
        # (host, salt) bucket at `budget` rows — any row ranked past the
        # budget within its bucket cannot be in the host's global top-k,
        # so the final per-host sort sees ≤ budget×salt rows instead of
        # the host's full batch.
        w_host = Window.partitionBy("host").orderBy(*_pop_order())
        if cfg.host_salt > 1:
            w_salted = Window.partitionBy(
                "host", F.pmod(F.xxhash64("url"), F.lit(cfg.host_salt))
            ).orderBy(*_pop_order())
            pre = fetchable.withColumn("_pr", F.row_number().over(w_salted)).filter(
                F.col("_pr") <= budget
            ).drop("_pr")
            ranked_h = pre.withColumn("_ph", F.row_number().over(w_host))
            admitted = ranked_h.filter(F.col("_ph") <= budget).drop("_ph")
            deferred = (
                fetchable.join(admitted.select("url"), "url", "left_anti")
                .drop("_visit", "_check")
                .select(*[f.name for f in schemas.FRONTIER.fields])
            )
        else:
            fetchable = fetchable.withColumn("_ph", F.row_number().over(w_host))
            admitted = fetchable.filter(F.col("_ph") <= budget).drop("_ph")
            deferred = (
                fetchable.filter(F.col("_ph") > budget)
                .drop("_ph", "_visit", "_check")
                .select(*[f.name for f in schemas.FRONTIER.fields])
            )

        # --- 8. fetch = left join vs corpus -----------------------------------
        fetched = admitted.join(
            self.pages.select("url", "html", "text", "lang"), "url", "left"
        )
        if self.redirects is not None and not cfg.use_fast_redirect_strategy and cfg.follow_redirects:
            fetched = fetched.join(
                F.broadcast(
                    self.redirects.select(
                        "url",
                        F.col("status").alias("_rstatus"),
                        F.col("location").alias("_rloc"),
                    )
                ),
                "url",
                "left",
            )
        else:
            fetched = fetched.withColumn("_rstatus", F.lit(None).cast("int")).withColumn(
                "_rloc", F.lit(None).cast("string")
            )
        fetched = fetched.withColumn("_hit", F.col("text").isNotNull()).withColumn(
            "_counting", F.col("_hit") & F.col("_rstatus").isNull()
        )

        # --- 7. totalPages budget: global-K cumulative cut over the DELTA ----
        # Only materialized when a budget is set; the window spans just the
        # round's consumed rows (noops + admitted), not the frontier.
        noops = filtered_out.select(
            *[f.name for f in schemas.FRONTIER.fields],
            F.lit("filtered").alias("_noopkind"),
        )
        if denied is not None:
            noops = noops.unionByName(
                denied.select(
                    *[f.name for f in schemas.FRONTIER.fields],
                    F.lit("robots_denied").alias("_noopkind"),
                )
            )

        hist_extra = None
        if cfg.total_pages != -1:
            remaining = cfg.total_pages - state.get("counted", 0)
            fetched = fetched.cache()
            counting_total = fetched.filter(F.col("_counting")).count()
            # oracle semantics: exhaustion fires only when a counting row
            # actually falls beyond the budget (the serial loop breaks at
            # that row); rows before it — including noops — still process.
            will_exhaust = counting_total > remaining
            merged = fetched.select(
                "url", "priority", "enq_round", "seq", "_counting"
            ).unionByName(
                noops.select(
                    "url", "priority", "enq_round", "seq", F.lit(False).alias("_counting")
                )
            )
            w_all = Window.orderBy(*_pop_order()).rowsBetween(Window.unboundedPreceding, 0)
            merged = merged.withColumn(
                "_cum", F.sum(F.col("_counting").cast("long")).over(w_all)
            )
            cut = merged.filter(F.col("_cum") <= remaining).select("url")
            # the exhausting row (first counting row beyond the budget) IS
            # history-inserted in the reference — insert happens inside
            # fetch() before produceKrawlActions' count check
            # (Krawler.kt:369-377 vs :348-354) — but never dispatched.
            hist_extra = merged.filter(
                F.col("_counting") & (F.col("_cum") == remaining + 1)
            ).select("url", "priority", "enq_round", "seq")
            fetched = fetched.join(F.broadcast(cut), "url", "left_semi")
            noops = noops.join(F.broadcast(cut), "url", "left_semi")
        else:
            will_exhaust = False

        fetched = fetched.cache()
        # one action materializes the whole upstream chain (dedup window,
        # bloom probe, anti-join, robots gate, politeness rank, fetch
        # join) so the table writes below run off caches
        fetched.count()
        tm.tick("materialize round chain")

        # --- history delta: deterministic ids in K order ----------------------
        consumed = fetched.select("url", "priority", "enq_round", "seq").unionByName(
            noops.select("url", "priority", "enq_round", "seq")
        )
        if hist_extra is not None:
            consumed = consumed.unionByName(hist_extra)
        base_id = state.get("next_history_id", 0)
        if cfg.deterministic_history_ids:
            w_id = Window.orderBy(*_pop_order())
            id_col = (F.row_number().over(w_id) - 1 + F.lit(base_id)).cast("long")
        else:
            # scale mode: no global ordering stage; ids = xxhash64(url)
            id_col = F.xxhash64("url")
        hist_delta = consumed.withColumn("id", id_col).select(
            "id", "url", F.xxhash64("url").alias("url_hash64"),
            F.lit(rnd).alias("seen_round"),
        )
        hist_delta = hist_delta.cache()

        # --- visited delta + per-host fetch ordinals ---------------------------
        ok = fetched.filter(F.col("_hit"))
        w_host_seq = Window.partitionBy("host").orderBy(*_pop_order())
        prev_host = self.store.read_snapshot("host_state", rnd - 1)
        visited = ok.withColumn("_hs", F.row_number().over(w_host_seq))
        if prev_host is not None:
            visited = visited.join(
                F.broadcast(prev_host.withColumnRenamed("fetched", "_prev")), "host", "left"
            ).withColumn("_hs", F.col("_hs") + F.coalesce(F.col("_prev"), F.lit(0))).drop("_prev")
        visited_out = visited.select(
            "url", "host", "depth", "root_page_id", "parent_url",
            F.lit(rnd).alias("fetch_round"),
            F.col("_hs").cast("int").alias("host_seq"),
            F.when(F.col("_visit"), F.lit("visit")).otherwise(F.lit("check")).alias("action"),
            F.coalesce(F.col("_rstatus"), F.lit(200)).alias("status"),
            "text", "lang",
        ).repartition(spark.sparkContext.defaultParallelism)  # de-skew the write

        host_counts = ok.groupBy("host").agg(F.count("*").alias("fetched"))
        if prev_host is not None:
            host_counts = (
                host_counts.unionByName(prev_host)
                .groupBy("host").agg(F.sum("fetched").alias("fetched"))
            )

        # --- events delta -------------------------------------------------------
        def _ev(df, kind, detail=None):
            return df.select(
                "url", "parent_url", F.lit(rnd).alias("round"),
                F.lit(kind).alias("kind"), F.lit(detail).cast("string").alias("detail"),
            )

        events = _ev(dup_events, "repeat_visit")
        if repeats is not None:
            events = events.unionByName(_ev(repeats, "repeat_visit"))
        if depth_cut is not None:
            events = events.unionByName(_ev(depth_cut, "depth_cut"))
        if denied is not None:
            events = events.unionByName(
                _ev(noops.filter(F.col("_noopkind") == "robots_denied"), "robots_denied")
            )
        events = events.unionByName(
            _ev(fetched.filter(~F.col("_hit")), "fetch_error", "no corpus row")
        )

        # --- 9+10. harvest: redirects re-enqueue + link extraction -------------
        slow_redirects = (
            self.redirects is not None
            and not cfg.use_fast_redirect_strategy
            and cfg.follow_redirects
        )
        # The fetch-join output is partitioned by host (politeness window),
        # so a hot host would funnel its whole page batch into ONE python
        # harvest task. Harvesting has no host affinity — round-robin it
        # across the cluster (north_rule: explicit skew mitigation).
        harvest_src = ok.filter(F.col("_visit") & F.col("_rstatus").isNull()).select(
            "url", "html", "depth", "root_page_id"
        ).repartition(spark.sparkContext.defaultParallelism * 2)
        priority_expr = self.priority_expr

        def _harvest(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                rows = []
                for url, html, depth, root in zip(
                    pdf["url"], pdf["html"], pdf["depth"], pdf["root_page_id"]
                ):
                    page = parse_url(url)
                    li = 0
                    for link in extract_links(html):
                        href = link.href
                        if href.startswith("#") or len(href) > 2048:
                            continue
                        child = parse_url(href, page, from_anchor=link.kind == "anchor",
                                          anchor_text=link.text, anchor_attrs=link.attrs)
                        canon = child.canonical
                        if link.kind == "anchor" and (canon == "http:///" or not canon.strip()):
                            continue
                        rows.append(
                            (canon, child.host, int(root) if root is not None else None,
                             url, int(depth) + 1, int(depth), child_seq(url, li))
                        )
                        li += 1
                yield pd.DataFrame(
                    rows,
                    columns=["url", "host", "root_page_id", "parent_url",
                             "depth", "parent_depth", "seq"],
                )

        children = harvest_src.mapInPandas(
            _harvest,
            schema=(
                "url string, host string, root_page_id int, parent_url string, "
                "depth int, parent_depth int, seq long"
            ),
        ).withColumn(
            "priority", F.expr(priority_expr).cast("int")
        ).withColumn("enq_round", F.lit(rnd + 1)).drop("parent_depth").select(
            *[f.name for f in schemas.FRONTIER.fields]
        )

        if slow_redirects:
            redirect_children = (
                ok.filter(F.col("_rstatus").isNotNull())
                .select("url", "_rloc", "depth", "root_page_id")
            )

            def _redir(batches: Iterator) -> Iterator:
                import pandas as pd

                for pdf in batches:
                    rows = []
                    for url, loc, depth, root in zip(
                        pdf["url"], pdf["_rloc"], pdf["depth"], pdf["root_page_id"]
                    ):
                        page = parse_url(url)
                        child = parse_url(loc or "", page)
                        rows.append(
                            (child.canonical, child.host,
                             int(root) if root is not None else None, url,
                             int(depth), 0, rnd + 1, child_seq(url, "redirect"))
                        )
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in schemas.FRONTIER.fields]
                    )

            children = children.unionByName(
                redirect_children.mapInPandas(_redir, schema=schemas.FRONTIER)
            )

        next_frontier = deferred.unionByName(children).cache()

        # --- parallel table writes ------------------------------------------
        # Every output below depends only on the cached round chain, so the
        # five delta/snapshot writes are independent Spark jobs — submit
        # them concurrently (FIFO scheduler interleaves their stages) and
        # commit only after all complete.
        from concurrent.futures import ThreadPoolExecutor

        def _retry(fn, *args):
            # AQE occasionally races when sibling threads execute actions
            # over shared cached sub-plans (SparkPlan.session NPE in
            # resetMetrics); one retry re-plans cleanly.
            try:
                return fn(*args)
            except Exception:
                time.sleep(1.0)
                return fn(*args)

        def _w_history() -> int:
            self.store.write_table("history", rnd, hist_delta)
            n = hist_delta.count()
            if cfg.use_bloom:
                old = self.store.read_snapshot("bloom", rnd - 1)
                delta_shards = bloom_ops.build_delta(
                    hist_delta, cfg.bloom_buckets, cfg.bloom_bits_per_bucket
                )
                self.store.write_table(
                    "bloom", rnd, bloom_ops.merge_shards(spark, old, delta_shards)
                )
            return int(n)

        def _w_frontier() -> int:
            self.store.write_table("frontier", rnd + 1, next_frontier)
            return int(next_frontier.count())

        def _agg_counts():
            return ok.agg(
                F.count(F.lit(1)).alias("v"),
                F.sum(F.col("_counting").cast("long")).alias("c"),
            ).first()

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_hist = pool.submit(_retry, _w_history)
            f_front = pool.submit(_retry, _w_frontier)
            f_vis = pool.submit(_retry, self.store.write_table, "visited", rnd, visited_out)
            f_host = pool.submit(_retry, self.store.write_table, "host_state", rnd, host_counts)
            f_ev = pool.submit(_retry, self.store.write_table, "events", rnd, events)
            f_agg = pool.submit(_retry, _agg_counts)
            hist_ct = f_hist.result()
            frontier_ct = f_front.result()
            agg = f_agg.result()
            f_vis.result()
            f_host.result()
            f_ev.result()
        tm.tick("parallel writes (history+bloom, frontier+harvest, visited, hosts, events)")

        visited_ct = int(agg["v"] or 0)
        counted_now = int(agg["c"] or 0)
        metrics_rows = [
            (rnd, "visited", int(visited_ct)),
            (rnd, "counted", int(counted_now)),
            (rnd, "frontier_next", int(frontier_ct)),
            (rnd, "history_inserted", int(hist_ct)),
        ]
        self.store.write_rows_local("metrics", rnd, metrics_rows, schemas.METRICS)

        new_state = {
            "counted": state.get("counted", 0) + int(counted_now),
            "next_history_id": base_id + int(hist_ct),
            "history_rows": state.get("history_rows", 0) + int(hist_ct),
        }
        new_state["exhausted"] = bool(will_exhaust)
        new_state["frontier_next"] = int(frontier_ct)
        tm.tick("metrics")
        self.store.commit_round(rnd, new_state)

        frontier.unpersist()
        keep.unpersist()
        if probed is not None:
            probed.unpersist()
        gated.unpersist()
        fetched.unpersist()
        hist_delta.unpersist()
        next_frontier.unpersist()
        return new_state

    # ------------------------------------------------------------------ driver
    def run(
        self,
        seeds: Optional[List[str]] = None,
        resume: bool = False,
        seeds_df: Optional[DataFrame] = None,
    ) -> dict:
        """Drive rounds until the frontier drains, the page budget is
        exhausted, or max_rounds (O7/O17 termination)."""
        cfg = self.config
        last = self.store.last_committed() if resume else None
        if last is not None:
            start = last + 1
            state = self.store.committed_state(last)
            frontier = self.store.read_snapshot("frontier", start)
        else:
            if seeds is None and seeds_df is None:
                raise ValueError("seeds required for a fresh crawl")
            frontier = (
                self.seed_frontier_df(seeds_df) if seeds_df is not None
                else self.seed_frontier(seeds)
            )
            self.store.write_table("frontier", 0, frontier)
            frontier = self.store.read_snapshot("frontier", 0)
            start = 0
            state = {"counted": 0, "next_history_id": 0}

        rnd = start
        for rnd in range(start, cfg.max_rounds):
            if state.get("exhausted"):
                break
            frontier = self._drain_submissions(rnd, frontier)
            if frontier is None:
                break
            # the committed frontier_next count makes the isEmpty probe
            # free except on the first round and the draining round
            # (live submissions can refill an empty frontier)
            if (rnd == start or state.get("frontier_next", 1) == 0) and frontier.isEmpty():
                break
            state = self._run_round(rnd, frontier, state)
            frontier = self.store.read_snapshot("frontier", rnd + 1)
        return {"rounds": rnd, "state": state}

    # ------------------------------------------------- O19/O20 maintenance ops
    def remove_urls_by_root_page(self, root_page_id: int) -> int:
        """DELETE FROM frontier WHERE root_page_id = ? (Krawler.kt:216-226)."""
        last = self.store.last_committed()
        rnd = 0 if last is None else last + 1
        f = self.store.read_snapshot("frontier", rnd)
        if f is None:
            return 0
        before = f.count()
        kept = f.filter(
            ~(F.col("root_page_id") == F.lit(root_page_id))
            | F.col("root_page_id").isNull()
        )
        kept = kept.cache()
        after = kept.count()
        self.store.write_table("frontier", rnd, kept)
        kept.unpersist()
        return int(before - after)

    def remove_urls_by_age(self, before_round: int) -> int:
        """DELETE FROM frontier WHERE enq_round < ? (Krawler.kt:228-234,
        age expressed in rounds — the engine's clock)."""
        last = self.store.last_committed()
        rnd = 0 if last is None else last + 1
        f = self.store.read_snapshot("frontier", rnd)
        if f is None:
            return 0
        before = f.count()
        kept = f.filter(F.col("enq_round") >= F.lit(before_round)).cache()
        after = kept.count()
        self.store.write_table("frontier", rnd, kept)
        kept.unpersist()
        return int(before - after)

    def clear_history(self, before_round: int) -> int:
        """O20: ``clearHistory(beforeTime)`` (History/Dao.kt:72-78) —
        drop URL-seen rows older than a round, freeing them for
        re-crawl. Round-granular: whole history deltas are retired.
        Stale bloom bits only ever cause false *positives*, which fall
        through to the exact anti-join — correctness unaffected."""
        import shutil as _sh

        last = self.store.last_committed()
        if last is None:
            return 0
        removed = 0
        for d in self.store.delta_dirs("history", min(before_round - 1, last)):
            removed += int(self.spark.read.parquet(d).count())
            _sh.rmtree(d, ignore_errors=True)
        return removed

    # ------------------------------------------------------------------ reads
    def visited(self, upto_round: Optional[int] = None) -> Optional[DataFrame]:
        r = upto_round if upto_round is not None else self.store.last_committed()
        if r is None:
            return None
        return self.store.read_deltas("visited", r)

    def history(self, upto_round: Optional[int] = None) -> Optional[DataFrame]:
        r = upto_round if upto_round is not None else self.store.last_committed()
        if r is None:
            return None
        return self.store.read_deltas("history", r)

    def events(self, upto_round: Optional[int] = None) -> Optional[DataFrame]:
        r = upto_round if upto_round is not None else self.store.last_committed()
        if r is None:
            return None
        return self.store.read_deltas("events", r)
