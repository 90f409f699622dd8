package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-isolation probe for the q_mahalanobis episode (VERDICT r13
  * #2): the query is closed-form arithmetic yet hit 2.89 → 38.7 s in
  * the r13 sticky-JIT episode. Two candidate hot surfaces:
  *
  *   1. the 6-moment aggregate — per-row `decimal(38,0)` sums run on
  *      BigDecimal-backed Decimals once the accumulator leaves the
  *      compact-long range (Σx² ≈ 6e27 at sf0.1), i.e. per-row boxed
  *      BigDecimal.add in the agg hot loop;
  *   2. the scoring projection + TakeOrdered — pure double codegen.
  *
  * This main times each stage separately (moments-only, score-only
  * given a precomputed broadcast row, full operator) over `iters`
  * passes, plus the r14 candidate fix: SALTED LONG-LIMB moments (pure
  * long arithmetic per row via a 2^19 limb split; r15 salt = partition-
  * local 2^24-row blocks of monotonically_increasing_id, a structural
  * per-group bound keeping every long sum < 2^62, one small decimal
  * combine) — same exact integer totals, no per-row Decimal.
  *
  * Usage: `runMain graft.RehearseMahalanobis <sfDir> [iters]`.
  */
object RehearseMahalanobis {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseMahalanobis <sfDir> [iters]")
    val dir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = Tables.load(spark, dir, "lineitem").select(
      (col("l_orderkey") * 8L + col("l_linenumber")).as("line_id"),
      col("l_quantity"), col("l_extendedprice"))

    def mu(c: String) =
      floor(col(c).cast("double") * 1e6 + 0.5).cast("decimal(38,0)")
    def muL(c: String) =
      floor(col(c).cast("double") * 1e6 + 0.5).cast("long")

    def time(label: String)(f: => Unit): Unit = {
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[mah] $label%-22s pass $i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
    }

    val base = li.select(col("line_id").cast("long").as("_id"),
      mu("l_quantity").as("_x"), mu("l_extendedprice").as("_y"))

    // Stage 1a: the shipped decimal(38,0) moment aggregate.
    time("moments_decimal") {
      base.agg(
        count(lit(1L)), sum(col("_x")), sum(col("_y")),
        sum(col("_x") * col("_x")), sum(col("_y") * col("_y")),
        sum(col("_x") * col("_y"))).collect()
    }

    // Stage 1b: salted long-limb moments — identical exact totals.
    // x < 2^37 in µ units; split x = a·2^19 + b so every per-row term
    // (a², ab, b², …) < 2^38; groups of ≤ 2^24 rows keep each long sum
    // < 2^62 at ANY scale; the small group-row combine is decimal.
    val baseL = li.select(col("line_id").cast("long").as("_id"),
      muL("l_quantity").as("_x"), muL("l_extendedprice").as("_y"))
    time("moments_longlimb") {
      val s = 19
      val m = (1L << s) - 1L
      val g = baseL
        .withColumn("_g", shiftright(monotonically_increasing_id(), 24))
        .withColumn("_xa", shiftright(col("_x"), s)).withColumn("_xb", col("_x").bitwiseAND(m))
        .withColumn("_ya", shiftright(col("_y"), s)).withColumn("_yb", col("_y").bitwiseAND(m))
        .groupBy("_g").agg(
          count(lit(1L)).as("n"),
          sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
          sum(col("_xa") * col("_xa")).as("xaa"),
          sum(col("_xa") * col("_xb")).as("xab"),
          sum(col("_xb") * col("_xb")).as("xbb"),
          sum(col("_ya") * col("_ya")).as("yaa"),
          sum(col("_ya") * col("_yb")).as("yab"),
          sum(col("_yb") * col("_yb")).as("ybb"),
          sum(col("_xa") * col("_ya")).as("paa"),
          sum(col("_xa") * col("_yb") + col("_xb") * col("_ya")).as("pab"),
          sum(col("_xb") * col("_yb")).as("pbb"))
      def dec(c: String) = col(c).cast("decimal(38,0)")
      val two = lit(2L).cast("decimal(38,0)")
      val sq = lit(1L << (2 * s)).cast("decimal(38,0)")
      val hf = lit(1L << s).cast("decimal(38,0)")
      g.agg(
        sum(col("n")).as("n"),
        sum(dec("sx")).as("sx"), sum(dec("sy")).as("sy"),
        sum(dec("xaa") * sq + two * dec("xab") * hf + dec("xbb")).as("sxx"),
        sum(dec("yaa") * sq + two * dec("yab") * hf + dec("ybb")).as("syy"),
        sum(dec("paa") * sq + dec("pab") * hf + dec("pbb")).as("sxy")).collect()
    }

    // Exactness cross-check: the two formulations must agree bitwise.
    locally {
      val d = base.agg(
        count(lit(1L)).as("n"),
        sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
        sum(col("_x") * col("_x")).as("sxx"),
        sum(col("_y") * col("_y")).as("syy"),
        sum(col("_x") * col("_y")).as("sxy")).head()
      val s = 19
      val m = (1L << s) - 1L
      val g = baseL
        .withColumn("_g", shiftright(monotonically_increasing_id(), 24))
        .withColumn("_xa", shiftright(col("_x"), s)).withColumn("_xb", col("_x").bitwiseAND(m))
        .withColumn("_ya", shiftright(col("_y"), s)).withColumn("_yb", col("_y").bitwiseAND(m))
        .groupBy("_g").agg(
          count(lit(1L)).as("n"),
          sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
          sum(col("_xa") * col("_xa")).as("xaa"),
          sum(col("_xa") * col("_xb")).as("xab"),
          sum(col("_xb") * col("_xb")).as("xbb"),
          sum(col("_ya") * col("_ya")).as("yaa"),
          sum(col("_ya") * col("_yb")).as("yab"),
          sum(col("_yb") * col("_yb")).as("ybb"),
          sum(col("_xa") * col("_ya")).as("paa"),
          sum(col("_xa") * col("_yb") + col("_xb") * col("_ya")).as("pab"),
          sum(col("_xb") * col("_yb")).as("pbb"))
      def dec(c: String) = col(c).cast("decimal(38,0)")
      val two = lit(2L).cast("decimal(38,0)")
      val sq = lit(1L << (2 * s)).cast("decimal(38,0)")
      val hf = lit(1L << s).cast("decimal(38,0)")
      val l = g.agg(
        sum(col("n")).as("n"),
        sum(dec("sx")).as("sx"), sum(dec("sy")).as("sy"),
        sum(dec("xaa") * sq + two * dec("xab") * hf + dec("xbb")).as("sxx"),
        sum(dec("yaa") * sq + two * dec("yab") * hf + dec("ybb")).as("syy"),
        sum(dec("paa") * sq + dec("pab") * hf + dec("pbb")).as("sxy")).head()
      val same = (0 until 6).forall { i =>
        String.valueOf(d.get(i)).replaceAll("\\.0+$", "") ==
          String.valueOf(l.get(i)).replaceAll("\\.0+$", "")
      }
      println(s"[mah] exactness decimal==longlimb: $same (${d.toSeq} vs ${l.toSeq})")
      require(same, "long-limb moments diverge from decimal moments")
    }

    // Stage 2: scoring projection + TakeOrdered given precomputed moments.
    val moRow = base.agg(
      count(lit(1L)).as("_n"),
      sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
      sum(col("_x") * col("_x")).as("_sxx"),
      sum(col("_y") * col("_y")).as("_syy"),
      sum(col("_x") * col("_y")).as("_sxy"))
    time("score_takeordered") {
      val scored = base.crossJoin(broadcast(moRow))
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val nD = d(col("_n"))
      val mx = d(col("_sx")) / nD; val my = d(col("_sy")) / nD
      val vx = d(col("_sxx")) / nD - mx * mx
      val vy = d(col("_syy")) / nD - my * my
      val cxy = d(col("_sxy")) / nD - mx * my
      val det = vx * vy - cxy * cxy
      val dx = d(col("_x")) - mx; val dy = d(col("_y")) - my
      val md2 = (dx * (vy * dx - cxy * dy) + dy * (vx * dy - cxy * dx)) / det
      scored.select(col("_id"),
          when(det <= 0.0, lit(null).cast("long"))
            .otherwise(floor(md2 * 1e6 + 0.5).cast("long")).as("_m"))
        .orderBy(col("_m").desc_nulls_last, col("_id").asc)
        .limit(100).collect()
    }

    // Full operator for reference.
    time("full_operator") {
      graft.operators.Outliers.mahalanobis2(li, "line_id",
        "l_quantity", "l_extendedprice", topK = 100).collect()
    }

    spark.stop()
  }
}
