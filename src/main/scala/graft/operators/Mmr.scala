package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.math.BigDecimal.RoundingMode

/** Maximal-Marginal-Relevance diversified rerank (Carbonell & Goldstein,
  * SIGIR 1998) over a bounded ANN candidate set: greedily pick the
  * candidate maximizing `λ·sim(q,c) − (1−λ)·max_{s∈S} sim(c,s)` until k
  * results are selected — relevance traded against redundancy with what
  * is already picked.
  *
  * Scale shape (the part that matters at 100 TB): candidate generation
  * is the corpus-sized stage and runs through the bounded-heap top-k
  * aggregate ([[Similarity.bruteForceTopKAgg]] — map-side partial
  * collapse, the exchange carries ≤ nCand rows per partition, corpus
  * vectors never shuffle). The greedy rerank itself is O(nCand²·dim)
  * over a RESULT-sized set (nCand rows regardless of corpus size) and
  * runs driver-side, exactly where a serving node would run it —
  * collecting the candidate set is result materialization, not a data
  * collect. (An IVF/PQ candidate generator drops in unchanged; brute
  * force is the oracle-exact baseline.)
  *
  * Determinism / oracle parity: the greedy uses 6-dp-rounded
  * similarities on both engines (candidate sims are the rounded scores
  * the top-k stage emits; pairwise sims are rounded the same way), the
  * argmax tie-breaks on ascending id, and λ = 0.5 keeps `1 − λ` exactly
  * representable. Dots are the same left-fold-over-doubles as
  * `list_dot_product` — bitwise equal inputs, identical IEEE arithmetic
  * after.
  */
object Mmr {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble

  /** Left-fold double dot product — same accumulation order as the
    * native [[Similarity.dot]] expression and DuckDB's
    * `list_dot_product`.
    */
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Diversified top-k for the single query vector `idCol = queryId`:
    * nCand brute-force candidates, then λ=0.5 MMR greedy down to k.
    * Output: (rank, vec_id, score) with score = the rounded MMR
    * objective at selection time.
    */
  def rerank(corpus: DataFrame, vecCol: String, idCol: String,
             queryId: Long, nCand: Int, k: Int,
             lambda: Double = 0.5): DataFrame = {
    val spark = corpus.sparkSession
    val anchors = corpus.filter(col(idCol) === queryId)
    val candScores = Similarity.bruteForceTopKAgg(corpus, anchors, vecCol, idCol, nCand)
      .select(col("vec_id"), col("score"))
    // Re-attach candidate vectors for the pairwise-redundancy term: the
    // candidate side is nCand rows — broadcast it, the corpus scan
    // stays shuffle-free.
    val cand = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("_v"))
      .join(broadcast(candScores), Seq("vec_id"))
      .select(col("vec_id"), col("score"), col("_v"))
    val rows = cand.collect().map { r =>
      (r.getLong(0), r.getDouble(1),
        r.getSeq[Float](2).map(_.toDouble).toArray)
    }.sortBy(_._1)
    val mu = 1.0 - lambda
    val pairSim: Map[(Long, Long), Double] = (for {
      (ia, _, va) <- rows; (ib, _, vb) <- rows if ia != ib
    } yield (ia, ib) -> round6(dotD(va, vb))).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.LinkedHashMap(rows.map(r => r._1 -> r._2): _*)
    while (selected.size < k && remaining.nonEmpty) {
      val (bestId, bestObj) = remaining.iterator.map { case (id, simq) =>
        val maxSel =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => pairSim((id, s._1))).max
        id -> (lambda * simq - mu * maxSel)
      }.reduceLeft { (a, b) =>
        if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
      }
      selected += bestId -> bestObj
      remaining.remove(bestId)
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((id, obj), i) => ((i + 1).toLong, id, round6(obj)) }
      .toDF("rank", "vec_id", "score")
  }

  /** DuckDB oracle twin of [[rerank]]: candidate CTE (unrounded ranking,
    * rounded sims into the greedy — mirroring the engine), pairwise-sim
    * CTE, then the k greedy steps unrolled as pick/sel CTE chains with
    * identical objective arithmetic and id tie-break.
    */
  def duckRerank(tbl: String, vecCol: String, idCol: String,
                 queryId: Long, nCand: Int, k: Int,
                 lambda: Double = 0.5): String = {
    val mu = 1.0 - lambda
    val steps = (1 to k).map { i =>
      val prevSel = s"sel${i - 1}"
      val msExpr =
        if (i == 1) "0.0"
        else "m.ms"
      val fromClause =
        if (i == 1) "cand c"
        else
          s"""cand c JOIN (SELECT c2.id, max(p.s) AS ms
             |            FROM cand c2 JOIN pairs p ON p.ai = c2.id
             |                 JOIN $prevSel s ON p.bi = s.id
             |            GROUP BY c2.id) m ON m.id = c.id
             |       WHERE c.id NOT IN (SELECT id FROM $prevSel)""".stripMargin
      val pick =
        s"""pick$i AS (
           |  SELECT c.id, round($lambda * c.simq - $mu * $msExpr, 6) AS obj
           |  FROM $fromClause
           |  ORDER BY $lambda * c.simq - $mu * $msExpr DESC, c.id ASC LIMIT 1)""".stripMargin
      val sel =
        if (i == 1) s"sel1 AS (SELECT id FROM pick1)"
        else s"sel$i AS (SELECT id FROM $prevSel UNION ALL SELECT id FROM pick$i)"
      s"$pick,\n$sel"
    }
    val finalRows = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, id AS vec_id, obj AS score FROM pick$i")
      .mkString("\nUNION ALL ")
    s"""WITH q AS (SELECT CAST($vecCol AS DOUBLE[]) AS qv FROM $tbl
       |           WHERE $idCol = $queryId),
       |cand0 AS (SELECT c.$idCol AS id, CAST(c.$vecCol AS DOUBLE[]) AS v,
       |                 list_dot_product((SELECT qv FROM q),
       |                                  CAST(c.$vecCol AS DOUBLE[])) AS simq
       |          FROM $tbl c WHERE c.$idCol <> $queryId),
       |cand AS (SELECT id, v, round(simq, 6) AS simq FROM (
       |           SELECT *, ROW_NUMBER() OVER (ORDER BY simq DESC, id ASC) AS rn
       |           FROM cand0) x
       |         WHERE rn <= $nCand),
       |pairs AS (SELECT a.id AS ai, b.id AS bi,
       |                 round(list_dot_product(a.v, b.v), 6) AS s
       |          FROM cand a JOIN cand b ON a.id <> b.id),
       |${steps.mkString(",\n")}
       |$finalRows""".stripMargin
  }
}
