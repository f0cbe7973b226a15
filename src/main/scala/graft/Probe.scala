package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExprs

import scala.collection.mutable.ArrayBuffer

/** Consolidated dev probe main (scratch-only, not a query surface):
  * every one-off measurement driver that produced a PLANS.md floor
  * decomposition lives here as a variant, so provenance notes stay
  * reproducible without a file per experiment.
  *
  *   sbt "runMain graft.Probe <variant> [dir] [extra...]"
  *
  * variants (original standalone main in parens — output formats kept
  * identical so PLANS.md references re-run verbatim):
  *   q1-split       (Q1Probe)  split-long sums vs DECIMAL vs scan floor
  *   q1-mpb         (Q1Probe2) q1 at maxPartitionBytes=extra, 4 reps
  *   q1-cols        (Q1Probe3) per-column decode cost of the q1 scan
  *   q1-mpb-best    (Q1Probe4) q1 best-of-3 at one mpb setting
  *   q1-grid        (Q1Probe5) mpb x columnar-batch-size grid sweep
  *   q1-repeat      (Q1Probe6) 6-rep q1 at the grid winner (GC/JVM grading)
  *   q1-floor       (Q1Probe7) decode vs aggregate decomposition
  *   quantile-parts (QProfile)  quantile machinery component times
  *   stages         (QProfile2) per-stage wall + executed plan of extra=query
  *   quantile-bhj   (QProfile3) probe-pass broadcast-join cost isolation
  *   plan           (QProfile4) optimized plan of extra=query
  */
object Probe {
  private def session(cpus: Int, conf: Map[String, String] = Map.empty): SparkSession = {
    val b = graft.core.GraftSession.builder(s"local[$cpus]", cpus)
    conf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def timed(tag: String, label: String, reps: Int, gc: Boolean = false)
                   (f: => Unit): Double = {
    val ts = (1 to reps).map { _ =>
      if (gc) System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[$tag] $label: best ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    ts.min
  }

  private def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("plan")
    val rest = args.drop(1)
    variant match {
      case "q1-split" => q1Split(rest)
      case "q1-mpb" => q1Mpb(rest)
      case "q1-cols" => q1Cols(rest)
      case "q1-mpb-best" => q1MpbBest(rest)
      case "q1-grid" => q1Grid(rest)
      case "q1-repeat" => q1Repeat(rest)
      case "q1-floor" => q1Floor(rest)
      case "heavy-gen" => heavyGen(rest)
      case "quantile-parts" => quantileParts(rest)
      case "stages" => stages(rest)
      case "quantile-bhj" => quantileBhj(rest)
      case "plan" => planOf(rest)
      case "overlap-floor" => overlapFloor(rest)
      case "overlap-fold" => overlapFold(rest)
      case "tfidf-floor" => tfidfFloor(rest)
      case other =>
        System.err.println(s"unknown probe variant: $other (see scaladoc)")
        sys.exit(2)
    }
  }

  /** (Q1Probe) split-long sums vs the current q1 vs the bare scan floor. */
  private def q1Split(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x100")
    val spark = session(32)
    val li = graft.core.Tables.lineitem(spark, dir)
    timed("prof", "q1_current", 3)(
      noop(SparkEntry.queries("q1_agg")(spark, dir)))
    def v(c: Column) = floor(c * 1000000.0 + 0.5)
    val q = col("l_quantity"); val ep = col("l_extendedprice")
    val di = col("l_discount"); val tx = col("l_tax")
    val disc = ep * (lit(1.0) - di); val chg = disc * (lit(1.0) + tx)
    val filtered = li.filter(col("l_shipdate") <= "2001-09-02")
    def split(c: Column, n: String): Seq[Column] = Seq(
      sum(shiftright(v(c), 19)).as(n + "_hi"),
      sum(v(c).bitwiseAND(lit((1L << 19) - 1))).as(n + "_lo"))
    val aggs: Seq[Column] =
      split(q, "sq") ++ split(ep, "sb") ++ split(disc, "sd") ++
        split(chg, "sc") :+ count(lit(1)).as("n")
    timed("prof", "q1_split_long", 3)(
      noop(filtered.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(aggs.head, aggs.tail: _*)))
    timed("prof", "scan_floor", 3)(
      noop(filtered.select(col("l_returnflag"), col("l_linestatus"), q, ep, di, tx)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))))
    spark.stop()
  }

  /** (Q1Probe2) q1 4-rep at an explicit maxPartitionBytes (args: dir mpb). */
  private def q1Mpb(args: Array[String]): Unit = {
    val spark = session(32,
      Map("spark.sql.files.maxPartitionBytes" -> args(1)))
    (1 to 4).foreach { _ =>
      val t0 = System.nanoTime()
      noop(SparkEntry.queries("q1_agg")(spark, args(0)))
      println(f"[q1] ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }

  /** (Q1Probe3) per-column decode cost of the q1 scan columns. */
  private def q1Cols(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x300")
    val spark = session(32)
    val li = graft.core.Tables.lineitem(spark, dir)
    println(s"[p3] scan partitions = ${li.rdd.getNumPartitions}")
    println(s"[p3] rows = ${li.count()}")
    for (c <- Seq("l_shipdate", "l_quantity", "l_extendedprice", "l_discount",
                  "l_tax", "l_returnflag", "l_linestatus")) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(li.select(col(c)))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[p3] col $c: ${ts.min}%.3f")
    }
    val t0 = System.nanoTime()
    noop(li.select(col("l_shipdate"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus")))
    println(f"[p3] all7: ${(System.nanoTime() - t0) / 1e9}%.3f")
    spark.stop()
  }

  /** (Q1Probe4) q1 best-of-3 at one mpb setting (args: dir [mpb]). */
  private def q1MpbBest(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x600")
    val mpb = if (args.length > 1) args(1) else "134217728"
    val spark = session(32, Map("spark.sql.files.maxPartitionBytes" -> mpb))
    val q = SparkEntry.queries("q1_agg")(spark, dir)
    println(s"[p4] scan partitions = ${graft.core.Tables.lineitem(spark, dir).rdd.getNumPartitions}")
    timed("p4", s"q1 mpb=$mpb", 3)(noop(q))
    spark.stop()
  }

  /** (Q1Probe5) grid-sweep split size x vectorized reader batch size. */
  private def q1Grid(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x600")
    val spark = session(32)
    val mpbs = Seq(128L << 20, 64L << 20, 96L << 20, 48L << 20)
    val batches = Seq(4096, 8192, 16384)
    for (mpb <- mpbs; b <- batches) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb.toString)
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", b.toString)
      val q = SparkEntry.queries("q1_agg")(spark, dir)
      timed("p5", s"mpb=${mpb >> 20}M batch=$b", 3, gc = true)(noop(q))
    }
    spark.stop()
  }

  /** (Q1Probe6) 6-rep q1 at the grid winner — run under different JVMs
    * via SPARK_GRAFT_JVM to grade GC / heap choices. */
  private def q1Repeat(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x600")
    val spark = session(32, Map(
      "spark.sql.files.maxPartitionBytes" -> (96L << 20).toString,
      "spark.sql.parquet.columnarReaderBatchSize" -> "8192"))
    val q = SparkEntry.queries("q1_agg")(spark, dir)
    val ts = (1 to 6).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      noop(q)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[p6] best ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }

  /** (Q1Probe7) decompose q1's wall into decode vs aggregate. */
  private def q1Floor(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x600")
    val spark = session(32)
    val li = graft.core.Tables.lineitem(spark, dir)
    val cols7 = Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate").map(col)
    timed("p7", "decode7_noop", 4, gc = true)(noop(li.select(cols7: _*)))
    timed("p7", "decode2_noop", 4, gc = true)(
      noop(li.select(col("l_returnflag"), col("l_quantity"))))
    timed("p7", "groupby_count_only", 4, gc = true)(
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)))))
    timed("p7", "q1_full", 4, gc = true)(
      noop(SparkEntry.queries("q1_agg")(spark, dir)))
    spark.stop()
  }

  /** Rebuild heavy-tier replica data without running the suite
    * (args: [outDir] [tiers...] — default all three). */
  private def heavyGen(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_heavy")
    val tiers = if (args.length > 1) args.drop(1).toSeq
      else Seq("x10", "x100", "x600")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session(32)
    tiers.foreach {
      case "x10" => BenchHeavy.buildReplicas(spark, src, s"$outDir/x10", 10)
      case "x100" => BenchHeavy.buildReplicas(spark, src, s"$outDir/x100", 100)
      case "x600" =>
        BenchHeavy.buildReplicas(spark, src, s"$outDir/x600", 600, Set("lineitem"))
      case other => sys.error(s"unknown tier $other")
    }
    spark.stop()
  }

  /** (QProfile) quantile machinery component times. */
  private def quantileParts(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x10")
    val spark = session(32)
    val li = graft.core.Tables.lineitem(spark, dir)
    timed("prof", "scan2col_count", 3)(
      noop(li.select(col("l_returnflag"), col("l_extendedprice"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)))))
    val v = col("l_extendedprice")
    val bucketed = li.select(col("l_returnflag"), v,
      shiftright(VectorExprs.sortableBits(v), 44).as("_b"))
    timed("prof", "histogram", 3)(
      noop(bucketed.groupBy(col("l_returnflag"), col("_b"))
        .agg(count(lit(1)).as("_cnt"))))
    val hist = bucketed.groupBy(col("l_returnflag").as("_g"), col("_b"))
      .agg(count(lit(1)).as("_cnt"))
    println("hist rows = " + hist.count())
    timed("prof", "full", 3)(
      noop(SparkEntry.queries("q_approx_quantiles")(spark, dir)))
    spark.stop()
  }

  /** (QProfile2) per-stage wall times + executed plan (args: dir query). */
  private def stages(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x100")
    val qname = if (args.length > 1) args(1) else "q_quantile_select"
    val spark = session(32)
    val stages = ArrayBuffer[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        stages += ((i.stageId, i.name.take(60), ms, i.numTasks))
      }
    })
    noop(SparkEntry.queries(qname)(spark, dir)) // warm
    stages.clear()
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(qname)(spark, dir)
    noop(df)
    println(f"[prof2] total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    stages.sortBy(-_._3).take(12).foreach { case (id, n, ms, t) =>
      println(f"[stage] $id%4d ${ms}%6d ms  tasks=$t%4d  $n")
    }
    println(df.queryExecution.executedPlan.toString.take(5000))
    spark.stop()
  }

  /** (QProfile3) isolate the probe-pass BHJ cost in valueAtRanks. */
  private def quantileBhj(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x100")
    val spark = session(32)
    import spark.implicits._
    val li = graft.core.Tables.lineitem(spark, dir)
    val bucketed = li.select(col("l_returnflag").as("g"),
      col("l_extendedprice").as("v"),
      shiftright(VectorExprs.sortableBits(col("l_extendedprice")), 44).as("_b"))
    timed("prof3", "scan_bits_agg", 3)(
      noop(bucketed.groupBy("g", "_b").count()))
    val targets = Seq(("A", 1234567L, 10L), ("N", 2345678L, 20L),
      ("R", 3456789L, 30L)).toDF("_tg", "_tb", "_rib")
    timed("prof3", "scan_bits_bhj", 3)(
      noop(bucketed.join(broadcast(targets),
        col("g") === col("_tg") && col("_b") === col("_tb"))))
    val targetsL = Seq((1234567L, 10L), (2345678L, 20L)).toDF("_tb", "_rib")
    timed("prof3", "scan_bits_bhj_long", 3)(
      noop(bucketed.join(broadcast(targetsL), col("_b") === col("_tb"))))
    timed("prof3", "scan_bits_filter", 3)(
      noop(bucketed.filter(col("_b") === 1234567L || col("_b") === 2345678L)))
    spark.stop()
  }

  /** (QProfile4) print the optimized plan of one query (args: dir query). */
  /** dd_overlap cost decomposition: bare text scan → +shingle kernel →
    * +vocab groupBy(h) → full query. Each step adds one plan component,
    * so step deltas attribute the wall to scan / kernel / exchange+agg
    * / sketch fold. */
  private def overlapFloor(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x100")
    val spark = session(32)
    import org.apache.spark.sql.graft.VectorExprs
    val docs = graft.core.Tables.documents(spark, dir)
    timed("floor", "a_scan", 3)(
      noop(docs.select(sum(length(col("text"))).as("s"))))
    timed("floor", "b_kernel", 3)(
      noop(docs.select(explode(VectorExprs.shingle3Md5Long(col("text"), 1, 8)).as("h8"))
        .agg(sum(col("h8")).as("s"))))
    timed("floor", "c_group", 3)(
      noop(docs.select((col("doc_id") % 2 === 0).as("_a"), (col("doc_id") % 2 === 1).as("_b"),
          explode(VectorExprs.shingle3Md5Long(col("text"), 1, 8)).as("h8"))
        .select((col("h8") % lit(2147483647L)).as("h"), col("_a"), col("_b"))
        .groupBy(col("h")).agg(max(col("_a")).as("in_a"), max(col("_b")).as("in_b"))
        .agg(count(lit(1)).as("n"))))
    timed("floor", "d_full", 3)(
      noop(SparkEntry.queries("dd_overlap")(spark, dir)))
    spark.stop()
  }

  /** dd_overlap fold timing + the corpus-distinct shingle count that
    * sizes its one exchange (args: dir). The fused-mapPartitions fold
    * alternative was A/B'd here and LOST (1.98 vs 1.81 s at x100: the
    * object-boundary row conversion costs more than the 36-buffer
    * HashAggregate it replaced) — the declarative form stays. */
  private def overlapFold(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x100")
    val spark = session(32)
    val docs = graft.core.Tables.documents(spark, dir)
    timed("fold", "full", 3, gc = true)(
      noop(graft.operators.Dedup.snapshotOverlap(docs,
        pmod(col("doc_id"), lit(2)) === 0, pmod(col("doc_id"), lit(2)) === 1)))
    // split-size sweep: the x100 docs arrive as ~37 MB packed splits
    // (one 32-task wave) — finer splits trade scheduling for straggler
    // smoothing on the kernel-heavy map stage
    for (mpb <- Seq("64m", "32m", "16m", "8m")) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      val d2 = graft.core.Tables.documents(spark, dir)
      timed("fold", s"full_mpb_$mpb", 3, gc = true)(
        noop(graft.operators.Dedup.snapshotOverlap(d2,
          pmod(col("doc_id"), lit(2)) === 0, pmod(col("doc_id"), lit(2)) === 1)))
    }
    spark.conf.unset("spark.sql.files.maxPartitionBytes")
    val g = docs
      .select(explode(VectorExprs.shingle3Md5Long(col("text"), 1, 8)).as("h8"))
      .select((col("h8") % lit(2147483647L)).as("h"))
    println("distinct shingles = " + g.distinct().count())
    spark.stop()
  }

  /** tx_tfidf cost decomposition: bare text scan → +termCounts kernel →
    * +df vocab exchange → +broadcast join → full query (window top-k).
    * Step deltas attribute the wall to scan / parse kernel / df
    * aggregate / join / rank. */
  private def tfidfFloor(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x100")
    val spark = session(32)
    import org.apache.spark.sql.graft.VectorExprs
    val docs = graft.core.Tables.documents(spark, dir)
    val tf = docs.select(col("doc_id"),
        explode(VectorExprs.termCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .withColumn("th", xxhash64(col("term")))
    val dfTab = docs.select(explode(
        VectorExprs.distinctTermHashes(col("text"))).as("th"))
      .groupBy(col("th")).agg(count(lit(1)).as("df"))
    timed("tfloor", "a_scan", 3)(
      noop(docs.select(sum(length(col("text"))).as("s"))))
    timed("tfloor", "b_tf_kernel", 3)(
      noop(tf.agg(sum(col("tf")).as("s"))))
    timed("tfloor", "c_df_agg", 3)(
      noop(dfTab.agg(count(lit(1)).as("n"), sum(col("df")).as("s"))))
    timed("tfloor", "d_join", 3)(
      noop(tf.join(broadcast(dfTab), Seq("th"))
        .agg(sum(col("tf") * col("df")).as("s"))))
    timed("tfloor", "e_full", 3)(
      noop(SparkEntry.queries("tx_tfidf")(spark, dir)))
    spark.stop()
  }

  private def planOf(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val qname = if (args.length > 1) args(1) else "q_calibration"
    val spark = session(8)
    val df = SparkEntry.queries(qname)(spark, dir)
    println(df.queryExecution.optimizedPlan.toString.take(4000))
    spark.stop()
  }
}
