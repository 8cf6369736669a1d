package graft.plans

import graft.functions.CosineSimilarity
import graft.functions.vectors._
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{broadcast, col, lit, typedlit}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Catalyst extension: transparent ANN serving for brute-force
  * cosine top-k plans (the reference serves every query through its
  * index once one exists, main.py:117-131 — this rule gives the SQL
  * surface the same behavior without the caller knowing an index
  * exists).
  *
  * The rule recognizes the canonical exact-scan shape
  * {{{
  *   embeddings.select($"vec_id", cosine_sim($"embedding", lit(q)).as("score"))
  *     .orderBy($"score".desc).limit(k)
  * }}}
  * — logically `Limit k · Sort(score DESC, global) · Project(…,
  * Alias(cosine_sim(emb, const))) · ParquetRelation(embeddings)` —
  * and, when `spark.graft.ann.rewrite=true`, swaps the full-corpus
  * sort for the session's memoized IVF probe over the SAME corpus:
  * centroids ranked driver-side against the literal query, `nProbe`
  * posting lists scanned instead of the whole table, exact cosine
  * rescoring inside the probe. Output attributes keep the original
  * plan's names, types, AND exprIds, so any operators above the
  * limit keep resolving.
  *
  * OPT-IN because the swap is semantics-changing (approximate):
  * default-off conf flag, recall accountability lives with the rest
  * of the IVF family (`index_recall_eval`, ≥ 0.9 bar). At 100 TB the
  * rewrite is the difference between a full-corpus scan+sort per
  * query and a partition-pruned read of nProbe/k of the corpus —
  * this is the optimizer doing what every vector store's query
  * planner does, expressed as a stock `SparkSessionExtensions` rule.
  *
  * Scope guards, all conservative: global descending sort on the
  * aliased score, constant query vector, bare Project over a parquet
  * scan whose root path is an `embeddings.parquet` corpus table
  * (anything else — filters, joins, non-constant queries — keeps the
  * exact plan).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(AnnTopKRewrite.apply)
    // the SQL function surface (graft.functions.registry) injected at
    // session build, so `spark.sql("SELECT cosine_sim(...)")` works
    // without a manual registration call in every session
    graft.functions.registry.injectInto(e)
  }
}

case class AnnTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.ann.rewrite").exists(_.toBoolean)

  /** nProbe for rewritten serves; the IVF default unless overridden. */
  private def nProbe: Int =
    spark.conf.getOption("spark.graft.ann.rewrite.nProbe")
      .map(_.toInt).getOrElse(graft.index.IvfIndex.defaultNProbe)

  /** Which index layout serves rewritten FILTERED shapes: `ivf`
    * (default — the partition-pruned posting probe) or `nsw` (the
    * graph walk with the accept predicate threaded through the beam,
    * NswIndex.searchFiltered) for sessions whose corpus layout is the
    * graph. Unfiltered shapes always serve from the IVF probe — the
    * layout choice only matters where the metadata path diverges. */
  private def layout: String =
    spark.conf.getOption("spark.graft.ann.rewrite.layout").getOrElse("ivf")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformDown {
      case l @ Limit(IntegerLiteral(k), s: Sort) if s.global =>
        rewrite(k, s).getOrElse(l)
    }

  private def rewrite(k: Int, s: Sort): Option[LogicalPlan] = s.child match {
    case Project(projList, lr: LogicalRelation) =>
      rewriteScan(k, s, projList, None, lr)
    // filtered variant: `WHERE pred ORDER BY cosine LIMIT k` becomes a
    // PRE-FILTERED probe (the filter runs inside the posting scan,
    // before the top-k cut — post-filtering the k approximate hits
    // would return < k rows and lose recall exactly when the filter
    // is tight; see ann_filtered_curve for the measured behavior)
    case Project(projList, Filter(cond, lr: LogicalRelation)) =>
      rewriteScan(k, s, projList, Some(cond), lr)
    case _ => None
  }

  /** Metadata columns the filtered rewrite may reference: the probe
    * swaps to the meta build (attribute storage) that carries them. */
  private val metaCols = Seq("label")

  private def rewriteScan(k: Int, s: Sort, projList: Seq[NamedExpression],
      cond: Option[Expression], lr: LogicalRelation): Option[LogicalPlan] =
      for {
        scoreAttr <- s.order.headOption.collect {
          case SortOrder(a: Attribute, Descending, _, _) => a
        }
        scoreAlias <- projList.collectFirst {
          case a @ Alias(_: CosineSimilarity, _) if a.exprId == scoreAttr.exprId => a
        }
        cos = scoreAlias.child.asInstanceOf[CosineSimilarity]
        queryVec <- constVector(cos.left).orElse(constVector(cos.right))
        dir <- corpusDir(lr)
        // every other projected column must be a plain relation
        // attribute the posting table also carries
        passthrough <- {
          val others = projList.filterNot(_.exprId == scoreAlias.exprId)
          if (others.nonEmpty && others.forall(_.isInstanceOf[AttributeReference]))
            Some(others.map(_.asInstanceOf[AttributeReference])) else None
        }
        // a filter must be deterministic (it re-evaluates inside the
        // probe) and touch only id/meta columns the posting rows carry
        _ <- if (cond.forall(c => c.deterministic &&
            c.references.forall(a => a.name == "vec_id" || metaCols.contains(a.name)) &&
            !starvesProbe(c)))
          Some(()) else None
        // the nsw layout only serves predicates over META columns: the
        // beam walk's frames rename vec_id to node, so a replayed
        // vec_id-referencing predicate (e.g. `vec_id > 100`) cannot
        // resolve inside the walk — those shapes fall back to the IVF
        // probe, whose posting rows keep vec_id (point shapes never
        // reach here: starvesProbe already declined them)
        probed <-
          if (cond.nonEmpty && layout == "nsw" &&
              cond.get.references.forall(a => metaCols.contains(a.name)))
            nswFilteredProbe(dir, queryVec, cond.get, k, passthrough)
          else ivfProbe(dir, queryVec, cond, k, passthrough)
      } yield {
        // splice with the ORIGINAL attribute ids so parents resolve
        val inner = probed.queryExecution.optimizedPlan
        val byName = inner.output.map(a => a.name -> a).toMap
        Project(
          projList.map {
            case a: AttributeReference =>
              Alias(byName(a.name), a.name)(exprId = a.exprId)
            case a: Alias =>
              Alias(byName("score"), a.name)(exprId = a.exprId)
          },
          inner)
      }

  /** The IVF posting probe serving a (possibly filtered) rewritten
    * shape: centroids ranked driver-side, nProbe posting lists
    * scanned, the predicate replayed in-scan before the top-k cut. */
  private def ivfProbe(dir: String, queryVec: Array[Float],
      cond: Option[Expression], k: Int,
      passthrough: Seq[AttributeReference]): Option[DataFrame] = {
    val built = if (cond.isEmpty) graft.index.IvfIndex.buildCached(spark, dir)
      else graft.index.IvfIndex.buildCachedFor(s"ivf_meta:$dir", spark,
        Tables.embeddings(spark, dir)
          .select((Seq("vec_id", "embedding") ++ metaCols).map(col): _*),
        dir, metaCols = metaCols)
    if (!passthrough.forall(a => built.assigned.columns.contains(a.name))) None
    else {
      // filtered shapes probe WIDER (the ivf_search_filtered nProbe=13
      // discipline): the predicate thins each probed cluster, so the
      // filtered candidate pool at the production nProbe is measurably
      // starved (ann_filtered_curve) — compensate instead of serving
      // short results
      val n = if (cond.isEmpty) nProbe else nProbe + 2
      val probeIds = topClusters(built.centroids, queryVec, n)
      val scanned = built.assigned
        .filter(col("cluster_id").isin(probeIds: _*))
      // replay the pushed-down predicate against the posting rows
      // (same column names; resolution re-binds by name)
      val filtered = cond.map(c => scanned.filter(replayPred(c))).getOrElse(scanned)
      Some(filtered
        .select(passthrough.map(a => col(a.name)) :+
          cosineSim(col("embedding"), typedlit(queryVec)).as("score"): _*)
        .orderBy(col("score").desc, col(passthrough.head.name).asc)
        .limit(k))
    }
  }

  /** The NSW graph probe for rewritten FILTERED shapes under
    * `spark.graft.ann.rewrite.layout=nsw`: the session's memoized
    * edge table walked with the predicate threaded through the beam
    * (accept-set top-k — NswIndex.searchFiltered's pre-filter
    * contract, beam width already filter-compensated). The k hit ids
    * then rescore against the corpus row (a k-row join) so the spliced
    * plan serves the caller's double-typed score column. */
  private def nswFilteredProbe(dir: String, queryVec: Array[Float],
      cond: Expression, k: Int,
      passthrough: Seq[AttributeReference]): Option[DataFrame] = {
    // the layout's OWN vectors table (checkpointed memo) — the spliced
    // plan must read index tables, not the source corpus scan, or the
    // served-by-index attestation would be false by construction
    val emb = graft.index.NswIndex.vectorsCached(spark, dir, metaCols)
    if (!passthrough.forall(a => emb.columns.contains(a.name))) None
    else {
      val edges = graft.index.NswIndex.edgesCached(spark, dir)
      val queries = spark.range(1)
        .select(lit(0L).as("q_id"), typedlit(queryVec).as("q_vec"))
      // the DRIVER-RESIDENT single-query walk (the interactive serve
      // path): per hop one job over the broadcast frontier, the accept
      // flag riding the scoring select, k-th-best bar over the
      // accepted set — vs the BSP loop's ~3 scheduled jobs per
      // superstep, which exists for unbounded query batches
      val hits = graft.index.NswIndex.beamSearch(
          emb, edges, queries, k = k, singleQuery = true,
          metaCols = metaCols, acceptPred = Some(replayPred(cond)))
        .select(col("neighbor_id").as("vec_id"))
      Some(emb.join(broadcast(hits), Seq("vec_id"))
        .select(passthrough.map(a => col(a.name)) :+
          cosineSim(col("embedding"), typedlit(queryVec)).as("score"): _*)
        .orderBy(col("score").desc, col(passthrough.head.name).asc)
        .limit(k))
    }
  }

  /** Re-bind a plan predicate's attributes by NAME so it can replay
    * against a probe frame carrying the same column names. */
  private def replayPred(c: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Bridge.column(c.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(a.name)
    })

  /** Point predicates on the id starve the probe pool: under a fixed
    * nProbe, `vec_id = c ORDER BY cosine LIMIT k` returns empty/short
    * results whenever the target's cluster isn't probed — a sharper
    * failure than the bounded recall loss the unfiltered rewrite
    * accepts (ann_filtered_curve measures the shape). Keep the EXACT
    * plan for id-equality/IN shapes; label-block predicates (the
    * selectivity the meta build is laid out for) still rewrite. */
  private def starvesProbe(c: Expression): Boolean = c.exists {
    case EqualTo(a: AttributeReference, _) => a.name == "vec_id"
    case EqualTo(_, a: AttributeReference) => a.name == "vec_id"
    case EqualNullSafe(a: AttributeReference, _) => a.name == "vec_id"
    case EqualNullSafe(_, a: AttributeReference) => a.name == "vec_id"
    case In(a: AttributeReference, _) => a.name == "vec_id"
    case InSet(a: AttributeReference, _) => a.name == "vec_id"
    case _ => false
  }

  private def constVector(e: Expression): Option[Array[Float]] = e match {
    case Literal(v: ArrayData, ArrayType(FloatType, _)) => Some(v.toFloatArray())
    case _ => None
  }

  /** The corpus dir of a parquet embeddings scan, if that's what this
    * relation is. */
  private def corpusDir(lr: LogicalRelation): Option[String] = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.headOption.map(_.toUri.getPath)
        .filter(_.endsWith("/embeddings.parquet"))
        .map(_.stripSuffix("/embeddings.parquet"))
    case _ => None
  }

  /** Rank centroids against the literal query driver-side — |k|
    * centroid rows, no job. */
  private def topClusters(centroids: org.apache.spark.sql.DataFrame,
      q: Array[Float], n: Int): Seq[Int] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val len = math.min(a.length, b.length)
      while (i < len) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    centroids.collect()
      .map(r => (r.getAs[Int]("cluster_id"),
        cos(r.getAs[scala.collection.Seq[Float]]("centroid").toArray, q)))
      .sortBy { case (id, c) => (-c, id) }
      .take(n).map(_._1).toSeq
  }
}

/** Registry surface for the rewrite: the standard `vec_id < 5`
  * serve workload pushed through the BRUTE-FORCE pattern with the
  * rewrite flag on, graded by the shared ANN serve grid plus a
  * `served_by_index` attestation — false (→ driver hash mismatch)
  * if any query's optimized plan still reads the parquet corpus,
  * i.e. if the rule silently stopped firing. */
object AnnRewrite {

  /** True iff `df`'s optimized plan no longer scans the parquet
    * embeddings table — the rewrite's observable effect. */
  private def servedByIndex(df: DataFrame): Boolean =
    !df.queryExecution.optimizedPlan.exists {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toString.contains("embeddings.parquet"))
        case _ => false
      }
      case _ => false
    }

  /** The brute-force cosine top-k DataFrame the rule targets —
    * written exactly as a user would write it, no index API in
    * sight. */
  def brutePlan(spark: SparkSession, dir: String, q: Array[Float],
      k: Int): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id",
        cosineSim($"embedding", typedlit(q)).as("score"))
      .orderBy($"score".desc, $"vec_id".asc)
      .limit(k)
  }

  /** `ann_rewrite`: run the workload under the flag, collect per-query
    * hits + the plan attestation, grade through the serve grid. */
  def annRewriteChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 10
    val queries = Tables.embeddings(spark, dir)
      .filter($"vec_id" < 5).select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    val prev = spark.conf.getOption("spark.graft.ann.rewrite")
    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      var allServed = true
      val hits = queries.flatMap { case (qid, qv) =>
        val df = brutePlan(spark, dir, qv, k)
        allServed &&= servedByIndex(df)
        df.collect().zipWithIndex.map { case (r, i) =>
          (qid, r.getAs[Long]("vec_id"),
            math.floor(r.getAs[Double]("score") * 1000000.0 + 0.5).toLong,
            (i + 1).toLong)
        }
      }.toSeq
      graft.index.ContractGrids.annServeGrid(spark, dir,
          spark.createDataFrame(hits.map(h => Row(h._1, h._2, h._3, h._4)).asJava,
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("q_id", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("neighbor_id", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("score_e6", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType)))),
          withTop1 = true)
        .withColumn("served_by_index", org.apache.spark.sql.functions.lit(allServed))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.ann.rewrite", v)
        case None => spark.conf.unset("spark.graft.ann.rewrite")
      }
    }
  }

  val annRewriteCheckedSql: String =
    """SELECT q.q_id, CAST(r.rank AS BIGINT) AS rank, true AS id_in_corpus,
      |  true AS score_exact, true AS top1_exact, true AS monotone,
      |  true AS served_by_index
      |FROM (SELECT vec_id AS q_id FROM embeddings WHERE vec_id < 5) q
      |CROSS JOIN generate_series(1, 10) r(rank)
      |ORDER BY q_id, rank""".stripMargin

  /** The filtered brute plan the extended rule targets — a metadata
    * predicate + cosine top-k, written exactly as a user would. */
  def bruteFilteredPlan(spark: SparkSession, dir: String, q: Array[Float],
      label: Int, k: Int): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .filter($"label" === label)
      .select($"vec_id",
        cosineSim($"embedding", typedlit(q)).as("score"))
      .orderBy($"score".desc, $"vec_id".asc)
      .limit(k)
  }

  /** `ann_rewrite_filtered`: the FILTERED workload (each query
    * restricted to its own label block) under the rewrite flag —
    * the rule must swap the filtered full-corpus sort for a
    * pre-filtered probe of the meta build. Graded through the shared
    * serve grid plus `passes_filter` (every hit satisfies the
    * predicate — a post-filter bug or a meta-column misjoin cannot
    * survive it) and the `served_by_index` attestation (false → hash
    * mismatch if the rule silently stops firing on filtered shapes). */
  def annRewriteFilteredChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 10
    val queries = Tables.embeddings(spark, dir)
      .filter($"vec_id" < 5).select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Int]("label")))
    val prev = spark.conf.getOption("spark.graft.ann.rewrite")
    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      var allServed = true
      val hits = queries.flatMap { case (qid, qv, lbl) =>
        val df = bruteFilteredPlan(spark, dir, qv, lbl, k)
        allServed &&= servedByIndex(df)
        df.collect().zipWithIndex.map { case (r, i) =>
          (qid, r.getAs[Long]("vec_id"),
            math.floor(r.getAs[Double]("score") * 1000000.0 + 0.5).toLong,
            (i + 1).toLong, lbl)
        }
      }.toSeq
      val hitsDf = spark.createDataFrame(
        hits.map(h => Row(h._1, h._2, h._3, h._4, h._5)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("q_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("neighbor_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("score_e6", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("q_label", org.apache.spark.sql.types.IntegerType))))
        .localCheckpoint(true)
      val grid = graft.index.ContractGrids.annServeGrid(spark, dir,
        hitsDf, withTop1 = true)
      // every hit must satisfy the predicate it was filtered by
      val nbrLabels = Tables.embeddings(spark, dir)
        .select($"vec_id".as("neighbor_id"), $"label".as("n_label"))
        .join(org.apache.spark.sql.functions.broadcast(
          hitsDf.select($"neighbor_id").distinct()), Seq("neighbor_id"), "left_semi")
      val passes = hitsDf
        .join(org.apache.spark.sql.functions.broadcast(nbrLabels),
          Seq("neighbor_id"), "left")
        .select($"q_id", $"rank",
          org.apache.spark.sql.functions.coalesce(
            $"n_label" === $"q_label",
            org.apache.spark.sql.functions.lit(false)).as("passes_filter"))
      grid.join(passes, Seq("q_id", "rank"))
        .withColumn("served_by_index", org.apache.spark.sql.functions.lit(allServed))
        .select(col("q_id"), col("rank"), col("id_in_corpus"),
          col("score_exact"), col("top1_exact"), col("monotone"),
          col("passes_filter"), col("served_by_index"))
        .orderBy(col("q_id"), col("rank"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.ann.rewrite", v)
        case None => spark.conf.unset("spark.graft.ann.rewrite")
      }
    }
  }

  val annRewriteFilteredCheckedSql: String =
    """SELECT q.q_id, CAST(r.rank AS BIGINT) AS rank, true AS id_in_corpus,
      |  true AS score_exact, true AS top1_exact, true AS monotone,
      |  true AS passes_filter, true AS served_by_index
      |FROM (SELECT vec_id AS q_id FROM embeddings WHERE vec_id < 5) q
      |CROSS JOIN generate_series(1, 10) r(rank)
      |ORDER BY q_id, rank""".stripMargin

  private implicit class SeqAsJava[T](s: Seq[T]) {
    def asJava: java.util.List[T] = {
      val l = new java.util.ArrayList[T](s.size)
      s.foreach(l.add)
      l
    }
  }
}
