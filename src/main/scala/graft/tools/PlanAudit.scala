package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Generates docs/PLANS.md: the physical-plan evidence for the scale
  * claims in docs/SCALING.md — which filters reached the parquet reader,
  * which joins broadcast, where exchanges sit, and that the custom
  * operators actually appear in their queries' plans. Run with
  * `sbt "runMain graft.tools.PlanAudit"` after plan-affecting changes
  * and commit the refreshed artifact.
  */
object PlanAudit {

  private case class Check(name: String, query: String, what: String,
                           mustContain: Seq[String], mustNotContain: Seq[String],
                           atMostOnce: Seq[String] = Seq())

  /** SCALING.md principle 3 guardrail: every EXPLICIT broadcast in
    * src/main/scala must be on this list with a structural-smallness
    * justification ("one-row aggregate", "parameter-bounded", "fixed
    * dimension") — never "small at current data". A new `broadcast(x)` /
    * `.hint("broadcast")` call fails the audit until it is justified
    * here; data-cardinality sides (per-item counts, per-group bounds,
    * vocabularies, fact tables) must stay hint-free so AQE degrades
    * them to shuffle joins instead of OOMing.
    */
  private case class AllowedBroadcast(file: String, arg: String, why: String,
                                      count: Int = 1)
  private val allowedBroadcasts = Seq(
    AllowedBroadcast("Similarity.scala", "q", "query set — API contract: structurally small (a query batch, not a corpus)"),
    AllowedBroadcast("Similarity.scala", "centroids",
      "k centroid rows — parameter-bounded (3rd/4th sites: " +
        "contrastivePairsIvf's and selfKnnIvf's ONE collected " +
        "centroid-array row)", count = 4),
    AllowedBroadcast("Embeddings.scala", "mu2",
      "one-row μ-norm² aggregate (geometryCard)"),
    AllowedBroadcast("Similarity.scala", "probed", "queries × nProbe rows — parameter-bounded"),
    AllowedBroadcast("Similarity.scala", "cents", "k centroid rows — parameter-bounded", count = 2),
    AllowedBroadcast("TextAnalysis.scala", "dfs", "df stats AFTER the query-term isin filter — |queryTerms| rows, parameter-bounded"),
    AllowedBroadcast("TextAnalysis.scala", "global", "one-row global aggregate"),
    AllowedBroadcast("TextAnalysis.scala", "totals", "one-row global aggregate", count = 2),
    AllowedBroadcast("TextAnalysis.scala", "total", "one-row token-count aggregate (phraseDetect/frequencySpectrum/goodTuring/vocabCoverageCurve)", count = 4),
    AllowedBroadcast("TextAnalysis.scala", "n", "one-row global aggregate", count = 2),
    AllowedBroadcast("TextAnalysis.scala", "tBig", "one-row bigram-type-count aggregate (knBigram's T)"),
    AllowedBroadcast("TextAnalysis.scala", "a", "one-row mean-tokens-per-cluster aggregate (clusterTerms' A)"),
    AllowedBroadcast("DataSelection.scala", "totals", "one-row feature-count aggregate (dsir smoothing denominators)"),
    AllowedBroadcast("DataSelection.scala", "stats", "hashed-bucket profile — B rows, parameter-bounded (buckets)"),
    AllowedBroadcast("DataSelection.scala", "gt", "one-row global LM totals (domainReweight)"),
    AllowedBroadcast("DataSelection.scala", "norm", "one-row softmax normalizer (domainReweight)"),
    AllowedBroadcast("DataSelection.scala", "ss", "per-source token totals — ≤|sources| rows, schema-bounded dimension (sourceKlMatrix)"),
    AllowedBroadcast("DataSelection.scala", "vtot", "one-row |vocabulary| aggregate (sourceKlMatrix smoothing)"),
    AllowedBroadcast("BloomPrune.scala", "filter", "fixed-size Bloom bitset — parameter-bounded (numBits)"),
    AllowedBroadcast("BloomPrune.scala", "bf", "fixed-size Bloom bitset — parameter-bounded (numBits)"),
    AllowedBroadcast("Ranking.scala", "offsetsPerSet", "numPartitions × numGroups longs — capped by maxDriverStateRows guard"),
    AllowedBroadcast("Ranking.scala", "n", "one-row global aggregate", count = 3),
    AllowedBroadcast("Ranking.scala", "p", "target-rank probe frame — |probs| rows, parameter-bounded"),
    AllowedBroadcast("Ranking.scala", "total", "one-row global aggregate"),
    AllowedBroadcast("Ranking.scala", "counts", "one-row global aggregate (groupCols.isEmpty branch only)"),
    AllowedBroadcast("PageRank.scala", "dangling", "one-row dangling-mass aggregate"),
    AllowedBroadcast("Hits.scala", "anorm", "one-row L2-norm aggregate"),
    AllowedBroadcast("Hits.scala", "hnorm", "one-row L2-norm aggregate"),
    AllowedBroadcast("Hits.scala", "mx", "one-row max-abs aggregate (scaled L2 norm)"),
    AllowedBroadcast("Bpe.scala", "best", "one-row best-pair aggregate (sort-limit 1; learnMerges + mergeSweepStats)", count = 2),
    AllowedBroadcast("Stats.scala", "total", "one-row global aggregate", count = 3),
    AllowedBroadcast("Stats.scala", "entropy", "one-row entropy aggregate", count = 2),
    AllowedBroadcast("Stats.scala", "m", "one-row hypothesis-count aggregate (bhFdr)"),
    AllowedBroadcast("Stats.scala", "margins", "one-row Σc² marginal aggregate (fleissKappa)"),
    AllowedBroadcast("Encoding.scala", "global", "one-row global-mean aggregate (targetEncode prior)"),
    AllowedBroadcast("Sampling.scala", "n", "one-row corpus-count aggregate (negativeSamples ring modulus)"),
    AllowedBroadcast("Sampling.scala", "minN", "one-row min-source-count aggregate (temperatureMix)"),
    AllowedBroadcast("FrameOps.scala", "carryIn", "sc.broadcast of a numPartitions-sized carry map (orderedRunning/orderedPrefixSum)", count = 2),
    AllowedBroadcast("Packing.scala", "n", "one-row count aggregate (curriculumOrder tier denominator)"),
    AllowedBroadcast("Packing.scala", "r", "one-row waste aggregate (batchWasteSaved baseline)"),
    AllowedBroadcast("Curation.scala", "blank", "one-row blank-doc count aggregate (reportCard)"),
    AllowedBroadcast("Curation.scala", "topSrc", "one-row max-source-count aggregate (reportCard)"),
    AllowedBroadcast("StreamingDrift.scala", "total", "one-row reference-count aggregate"),
    AllowedBroadcast("Decontamination.scala", "evalSh", "eval-benchmark shingles (MBs against 100 TB); flag-guarded — broadcastEval=false degrades to shuffle join"),
    AllowedBroadcast("Decontamination.scala", "ev", "eval-benchmark embeddings (MBs against 100 TB); flag-guarded — broadcastEval=false degrades to shuffle join (semanticFlags)"),
    AllowedBroadcast("Decontamination.scala", "centroids", "IVF coarse-centroid frame — one row per cell, cell-bounded (ivfFlags probe)"),
    AllowedBroadcast("Decontamination.scala", "probed", "|eval| x nProbe probe rows — eval-scale (MBs); flag-guarded — broadcastEval=false degrades to shuffle join (ivfFlags)"),
    AllowedBroadcast("Embeddings.scala", "comps", "k PCA component rows — parameter-bounded"),
    AllowedBroadcast("Pq.scala", "cb", "PQ codebook — m × ks rows, parameter-bounded (collected per iteration as a literal frame)", count = 4),
    AllowedBroadcast("KMeans.scala", "cb", "k-means centroid frame — k rows, parameter-bounded (collected per iteration as a literal frame)"),
    AllowedBroadcast("Pq.scala", "centroids", "IVF coarse-centroid frame — one row per cell (nlist-bounded), the q129 probe-path argument", count = 3),
    AllowedBroadcast("Bpe.scala", "mx", "one-row max-persisted-token-id aggregate (byte-fallback vocab extension)"),
    AllowedBroadcast("UnigramLm.scala", "tot", "one-row (Σcnt, |candidates|) smoothing-denominator aggregate"),
    AllowedBroadcast("NgramLm.scala", "v", "one-row |vocabulary| distinct-count aggregate (bigram smoothing denominator; heldOut unseen-mass twin)", count = 2),
    AllowedBroadcast("NgramLm.scala", "nd", "one-row doc-count aggregate (perplexity-tercile denominator)"),
    AllowedBroadcast("NgramLm.scala", "tv", "one-row (T bigram types, |V|) aggregate (KN continuation-unigram denominator)"),
    AllowedBroadcast("NaiveBayes.scala", "v", "one-row |vocabulary| distinct-count aggregate (NB smoothing denominator)", count = 2),
    AllowedBroadcast("NaiveBayes.scala", "dt", "one-row doc-count aggregate (NB prior denominator)"),
    AllowedBroadcast("NaiveBayes.scala", "ls", "per-label prior/unknown-mass stats — ≤|labels| rows, schema-bounded dimension (nation/region precedent)"),
    AllowedBroadcast("Cooccurrence.scala", "np", "one-row total-pair-count aggregate (PMI normalizer)"),
    AllowedBroadcast("Cooccurrence.scala", "nw", "one-row total-token-count aggregate (PMI normalizer)"),
    AllowedBroadcast("Cooccurrence.scala", "d", "one-row doc-count aggregate (dispersion denominator)"),
    AllowedBroadcast("Profile.scala", "total", "one-row global aggregate"),
    AllowedBroadcast("MarketBasket.scala", "nBaskets", "one-row basket-count aggregate"),
    AllowedBroadcast("ProductAnalytics.scala", "anchor", "one-row max-timestamp aggregate (decayedScore/userFeatures)", count = 2),
    AllowedBroadcast("Maintenance.scala", "total", "one-row count aggregate (z-order rank denominator)"),
    AllowedBroadcast("SparkEntry.scala", "nat", "nation — fixed 25-row dimension by schema contract", count = 2),
    AllowedBroadcast("SparkEntry.scala", "reg", "region — fixed 5-row dimension by schema contract", count = 3),
    AllowedBroadcast("SparkEntry.scala", "tot", "one-row grand-total aggregate (q167, q127 recall)", count = 2),
    AllowedBroadcast("SparkEntry.scala", "hits", "one-row detected-pair count aggregate (q260 recall)"),
    AllowedBroadcast("SparkEntry.scala", "<hint>", "q77 broadcast range join — the custom strategy fires ONLY on a user-explicit hint; contract documented in plans/BroadcastRangeJoin.scala"),
    AllowedBroadcast("WebCuration.scala", "blocked",
      "domain blocklist — operator contract: a curated block set, " +
        "always small relative to the corpus it filters"),
    AllowedBroadcast("Robots.scala", "rules",
      "parsed robots rule set — host-scale (a few rules per site), " +
        "always small next to the URL corpus it gates"))

  /** Returns (violations, inventory). A violation is an explicit
    * broadcast call in src/main/scala not on [[allowedBroadcasts]], or
    * MORE call sites for an allowlisted (file, arg) than the allowlist
    * justifies — a new `broadcast(total)` can't hide behind an existing
    * one. Matching runs over whole file contents (multi-line calls
    * can't dodge a per-line scan); comment lines are excluded.
    */
  private def auditBroadcasts(): (Seq[String], Seq[String]) = {
    import scala.jdk.CollectionConverters._
    val callRx = "broadcast\\(\\s*([A-Za-z_][A-Za-z0-9_]*)".r
    val hintRx = "hint\\(\\s*\"broadcast\"\\s*\\)".r
    val files = Files.walk(Paths.get("src/main/scala")).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
    val found = files.flatMap { p =>
      val content = Files.readString(p)
      val lineStarts = (-1 +: content.zipWithIndex.collect {
        case ('\n', i) => i }.toSeq).toArray
      def lineOf(off: Int): Int = {
        var lo = 0; var hi = lineStarts.length - 1
        while (lo < hi) {
          val mid = (lo + hi + 1) / 2
          if (lineStarts(mid) < off) lo = mid else hi = mid - 1
        }
        lo + 1
      }
      def lineText(off: Int): String = {
        val start = lineStarts(lineOf(off) - 1) + 1
        val end = content.indexOf('\n', start) match {
          case -1 => content.length; case e => e
        }
        content.substring(start, end)
      }
      val hits =
        callRx.findAllMatchIn(content).map(m => (m.start, m.group(1))) ++
          hintRx.findAllMatchIn(content).map(m => (m.start, "<hint>"))
      hits.toSeq.collect {
        case (off, arg)
            if !{ val t = lineText(off).trim
              t.startsWith("//") || t.startsWith("*") || t.startsWith("/*") } =>
          (p.getFileName.toString, arg, lineOf(off))
      }
    }
    val allowed = allowedBroadcasts.map(a => (a.file, a.arg) -> a.count).toMap
    val bySite = found.groupBy { case (f, a, _) => (f, a) }
    val violations = bySite.toSeq.sortBy(_._1.toString).flatMap {
      case ((f, a), sites) =>
        val cap = allowed.getOrElse((f, a), 0)
        if (sites.length > cap)
          Seq(s"$f broadcast($a): ${sites.length} sites (allowlisted: $cap) " +
            s"at lines ${sites.map(_._3).sorted.mkString(", ")}")
        else Nil
    }
    val inventory = found.sortBy(s => (s._1, s._3))
      .map { case (f, a, l) => s"$f:$l `$a`" }
    (violations, inventory)
  }

  private val checks = Seq(
    Check("scan pushdown & pruning", "q01_filter_project",
      "filters reach the parquet reader; only projected columns are read",
      Seq("PushedFilters: [IsNotNull", "ReadSchema"), Seq()),
    Check("dimension broadcast", "q03_revenue_by_nation",
      "nation/region (fixed-size dims) join as BroadcastHashJoin; customer is " +
        "deliberately hint-free (scales with input — AQE broadcasts it at test SFs)",
      Seq("BroadcastHashJoin"), Seq("BroadcastNestedLoopJoin")),
    Check("ANN partial aggregation", "q18_ann_bruteforce",
      "TopKAgg pre-reduces per partition before the shuffle (partial_topkagg below the exchange)",
      Seq("partial_topkagg"), Seq("CartesianProduct")),
    Check("bucketed co-located join", "q47_bucketed_join",
      "both sides scan bucketed tables; no shuffle feeds the join (at oracle scale AQE " +
        "broadcasts the small side — BucketedSpec separately asserts the zero-" +
        "shuffle-exchange SortMergeJoin when broadcast is disabled)",
      Seq("graft_q47_li", "graft_q47_ord"),
      Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Check("bucketed range join", "q60_range_join",
      "point-in-interval runs as an equi-join on bucket keys - no nested-loop/cartesian plan",
      Seq(), Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Check("custom broadcast range join", "q77_broadcast_range_join",
      "the hinted BETWEEN join plans as the custom BroadcastPointInIntervalJoin operator",
      Seq("BroadcastPointInIntervalJoin"), Seq("BroadcastNestedLoopJoin")),
    Check("bloom-pruned join", "q84_bloom_pruned_join",
      "the Bloom membership filter sits on the probe side below the join",
      Seq("UDF(l_orderkey"), Seq()),
    Check("partition pruning", "q75_partition_prune",
      "the partition-column filter prunes directories, not rows",
      Seq("PartitionFilters"), Seq()),
    Check("fuzzy-linkage blocking", "q106_fuzzy_match",
      "candidate generation is an equi-join on the prefix block (levenshtein " +
        "only verifies inside blocks) — no all-pairs product",
      Seq("levenshtein"), Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Check("few-giant-groups ranking", "q112_range_rank",
      "ranks come from the range-sort + offset RDD pass — NO per-group " +
        "Window sort anywhere in the plan (3 groups would mean 3 tasks)",
      Seq("Scan ExistingRDD"), Seq("Window")),
    Check("triangle orientation equi-joins", "q116_triangles",
      "wedge generation and closure are hash equi-joins (the only loop " +
        "joins are the one-row stat cross joins) — no cartesian product",
      Seq(), Seq("CartesianProduct")),
    Check("as-of running window", "q117_asof_forward",
      "the forward as-of is one key-partitioned running window over the " +
        "tagged union — no join product at all",
      Seq("Window"), Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Check("cluster-aware split", "q179_cluster_split",
      "the representative attach is a plain equi-join against the " +
        "∝-clustered-docs frame; no join product anywhere in the " +
        "pair/closure/split chain",
      Seq(), Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Check("k-means map-side argmin", "q243_kmeans",
      "the n×k assignment expansion collapses in the partial min(struct) " +
        "aggregate BELOW the exchange (shuffle carries corpus rows, not " +
        "corpus×k); the only loop join is against the k-row literal codebook",
      Seq("partial_min"), Seq("CartesianProduct")),
    Check("k-anonymity two-level distinct", "q180_k_anonymity",
      "l-diversity comes from the chained (quasi, sensitive) → quasi " +
        "hash aggregations — no Expand-based count_distinct widening " +
        "every input row",
      Seq("HashAggregate"), Seq("Expand")),
    Check("NB label grid broadcast", "q280_nb_classify",
      "the (doc × label) grid comes from broadcasting the ≤|labels|-row " +
        "stats frame (nation/region precedent) — never a shuffled " +
        "cartesian; the argmax is a map-side-combinable min(struct)",
      Seq("BroadcastNestedLoopJoin", "partial_min"),
      Seq("CartesianProduct")),
    Check("WordPiece doc-partitioned position window", "q276_wordpiece_encode",
      "the only corpus-row window is the doc-partitioned position rank " +
        "(doc-length-bounded groups) — no one-task global window",
      Seq("Window"), Seq("SinglePartition")),
    Check("KN trigram bounded-frame scoring", "q294_kn_trigram_nll",
      "the token stream left-joins five checkpointed type frames as " +
        "plain shuffle joins AQE can re-plan; the only nested-loop join " +
        "is the one-row (T, |V|) broadcast — never a shuffled cartesian",
      Seq("BroadcastNestedLoopJoin"), Seq("CartesianProduct")),
    Check("IVF decontamination probe pruning", "q296_ivf_decon",
      "eval vectors meet the cell-bounded centroid frame through a " +
        "broadcast nested loop; the corpus joins only the broadcast " +
        "probe rows on the cell key — the corpus side is never " +
        "cartesian-expanded against the full eval set",
      Seq("BroadcastNestedLoopJoin", "BroadcastHashJoin"),
      Seq("CartesianProduct")),
    Check("inverted-index partition pruning", "q319_bm25_from_index",
      "the postings scan prunes to the query terms' md5-bucket " +
        "PARTITION directories and the plan never touches the corpus " +
        "parquet — the zero-corpus-scan retrieval contract",
      Seq("PartitionFilters: [pbucket"), Seq("documents.parquet")),
    Check("line-dedup argmin shape", "q315_line_dedup",
      "global keep-first line dedup runs as explode + min(struct) " +
        "argmin + join-back + sorted-struct reassembly — no window " +
        "over the corpus, no join product",
      Seq(), Seq("Window", "CartesianProduct", "BroadcastNestedLoopJoin")),
    Check("recipe-replication k-row joins", "q316_recipe_replicate",
      "the epoch factors meet the doc stream through plain equi-joins " +
        "(k-row sides hint-free for AQE); replication is a row-local " +
        "sequence explode — no join product, no window",
      Seq("Generate"), Seq("Window", "CartesianProduct")),
    Check("single-scan canary audit", "q307_canary_scan",
      "ALL canaries' occurrence counts come from ONE scan of documents " +
        "(one projection + one combinable aggregate, unpivoted) — no " +
        "per-canary union of full scans",
      Seq(), Seq("Union"), atMostOnce = Seq("Scan parquet")),
    Check("contrastive-IVF zero-shuffle probe", "q331_contrastive_ivf",
      "each anchor picks its nProbe cells ROW-LOCALLY from the one-row " +
        "collected centroid array (broadcast nested loop + explode) — " +
        "no window, no per-anchor rank exchange; the only quadratic " +
        "surface is the within-cell equi-join; both argmaxes are " +
        "combinable min(struct) aggregates",
      Seq("BroadcastNestedLoopJoin", "Generate"),
      Seq("Window", "CartesianProduct")),
    Check("PII scrub pure-map shape", "q342_pii_scrub",
      "scan+regexp census+redaction stays one map stage over the " +
        "2-column scan — no join, no aggregate, no window anywhere " +
        "(the only exchange is the output-order sort)",
      Seq("ReadSchema: struct<doc_id:bigint,text:string>"),
      Seq("Join", "Aggregate", "Window", "CartesianProduct")),
    Check("cluster-topic vocab-bounded labeling", "q343_cluster_topics",
      "after the one doc-terms shuffle, scoring and the top-m rank live " +
        "on the (cluster, term) frame — the window partitions by " +
        "cluster over Heaps-bounded vocab rows, and A joins as a " +
        "one-row broadcast, never a corpus-keyed exchange",
      Seq("Window"), Seq("CartesianProduct")),
    Check("IVF list-balance column-pruned key scan",
      "q354_ivf_list_balance",
      "per-cell counts come off the lists' hive partition keys only — " +
        "the quantized vector/code columns are never read (empty data " +
        "ReadSchema on the lists scan); the k-row summary rejoins as a " +
        "broadcast, no window, no corpus product anywhere",
      Seq("ReadSchema: struct<>"),
      Seq("Window", "CartesianProduct")),
    Check("self-kNN hubness row-local probe + bounded top-k",
      "q348_ann_hubness",
      "the corpus-as-queries kNN probes cells from the one-row " +
        "collected centroid broadcast (no probe shuffle) and the " +
        "neighbor lists come from the partial TopKAgg — no window, no " +
        "all-pairs product anywhere",
      Seq("partial_topkagg", "BroadcastNestedLoopJoin"),
      Seq("Window", "CartesianProduct")),
    Check("URL dedup single-aggregate shape", "q366_url_canonical_dedup",
      "the whole canonicalizer is ONE codegen'd projection (regex + " +
        "array ops, no UDF) and dedup is a single hash aggregate on " +
        "the canonical string — one corpus scan, no join, no window",
      Seq("HashAggregate"),
      Seq("Join", "Window", "CartesianProduct"),
      atMostOnce = Seq("Scan parquet")),
    Check("sliding-chunk pure-map shape", "q368_sliding_chunks",
      "tokenize → explode(sequence) → slice stays a projection + " +
        "Generate over one 2-column scan — no join, no aggregate, no " +
        "window (the only exchange is the output-order sort)",
      Seq("Generate", "ReadSchema: struct<doc_id:bigint,text:string>"),
      Seq("Join", "Window", "CartesianProduct", "HashAggregate")),
    Check("HTML extraction pure-projection shape", "q369_html_extract",
      "the whole extractor (comment/script/style strip, tag strip, " +
        "entity decode, anchors, link density) is chained regex " +
        "projections over one 2-column scan — no join, no aggregate, " +
        "no window, no generate (the only exchange is the output-order " +
        "sort)",
      Seq("ReadSchema: struct<doc_id:bigint,text:string>"),
      Seq("Join", "Window", "CartesianProduct", "HashAggregate",
        "Generate"),
      atMostOnce = Seq("Scan parquet")))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# Generated audit — physical-plan evidence for the SCALING.md claims\n\n")
    sb.append("(The narrative above is curated; this section is regenerated by\n")
    sb.append("`sbt \"runMain graft.tools.PlanAudit\"` and FAILS the run when a plan\n")
    sb.append("loses a claimed property.)\n\n")
    sb.append("Generated against `" + sfDir + "`.\n")
    sb.append("Each section greps the FORMATTED physical plan of a driver query\n")
    sb.append("for the shape the design doc claims; a missing marker fails the run.\n\n")
    var failures = 0
    val (violations, inventory) = auditBroadcasts()
    if (violations.nonEmpty) failures += 1
    sb.append(s"## explicit-broadcast allowlist — ${if (violations.isEmpty) "OK" else "FAIL"}\n\n")
    sb.append("Every explicit `broadcast()` / `.hint(\"broadcast\")` in src/main/scala\n")
    sb.append("must carry a STRUCTURAL smallness justification in PlanAudit's\n")
    sb.append("allowlist (SCALING.md principle 3); data-cardinality sides stay\n")
    sb.append("hint-free so AQE degrades them to shuffle joins instead of OOMs.\n\n")
    if (violations.nonEmpty)
      sb.append("UNJUSTIFIED broadcasts:\n" +
        violations.map(v => s"- $v").mkString("\n") + "\n\n")
    sb.append(s"${inventory.size} justified sites:\n")
    sb.append(inventory.map(v => s"- $v").mkString("\n")).append("\n\n")
    checks.foreach { c =>
      val df = SparkEntry.queries(c.query)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val missing = c.mustContain.filterNot(plan.contains)
      val present = c.mustNotContain.filter(plan.contains)
      // counts PHYSICAL NODES: the formatted detail section prints one
      // "(N) <node>" header per plan node (the tree section repeats the
      // node name, so a raw substring count would double-count)
      val repeated = c.atMostOnce.filter { m =>
        plan.linesIterator.count(_.matches(s"^\\(\\d+\\) \\Q$m\\E\\b.*")) > 1
      }
      val ok = missing.isEmpty && present.isEmpty && repeated.isEmpty
      if (!ok) failures += 1
      sb.append(s"## ${c.name} — `${c.query}` — ${if (ok) "OK" else "FAIL"}\n\n")
      sb.append(s"${c.what}\n\n")
      if (missing.nonEmpty) sb.append(s"MISSING markers: ${missing.mkString(", ")}\n\n")
      if (present.nonEmpty) sb.append(s"FORBIDDEN nodes present: ${present.mkString(", ")}\n\n")
      if (repeated.nonEmpty) sb.append(s"AT-MOST-ONCE markers repeated: ${repeated.mkString(", ")}\n\n")
      // keep the artifact readable: only the node lines, not column lists
      val nodeLines = plan.linesIterator
        .filter(l => l.matches("^[=+*:\\-\\s]*\\(?\\d*\\)?\\s*[A-Z].*") &&
          !l.startsWith("Output") && !l.startsWith("Arguments") &&
          !l.startsWith("Input") && !l.startsWith("Functions") &&
          !l.startsWith("Aggregate") && !l.startsWith("Keys") &&
          !l.startsWith("Results") && !l.startsWith("Condition") &&
          !l.startsWith("Join"))
        .take(40).mkString("\n")
      sb.append("```\n").append(nodeLines).append("\n```\n\n")
    }
    Files.createDirectories(Paths.get("docs"))
    // docs/PLANS.md = curated narrative + this generated section; keep
    // everything above the generated marker intact across regenerations
    val path = Paths.get("docs/PLANS.md")
    val marker = "# Generated audit —"
    val curated =
      if (Files.exists(path)) {
        val cur = Files.readString(path)
        val at = cur.indexOf(marker)
        if (at >= 0) cur.substring(0, at) else cur.stripTrailing() + "\n\n---\n\n"
      } else ""
    Files.writeString(path, curated + sb.toString)
    val totalChecks = checks.size + 1 // + the broadcast allowlist
    println(s"PLANAUDIT ${totalChecks - failures}/$totalChecks ok -> docs/PLANS.md")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
